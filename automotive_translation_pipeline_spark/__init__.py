"""PySpark-native analytics engine with the query and data-processing
capabilities of DeshantBani/automotive-translation-pipeline.

The reference (/root/reference) is a single-node Python ETL pipeline that
translates automotive diagnostic sentences through a batch LLM API. This
package re-expresses everything it computes — scans, filters, anti-join
dedup, token-aware batch packing, a grouped remote-function map, a
multi-strategy parse/repair stack, result re-joins, window-style neighbor
analysis, summary rollups, and an upserted tracking ledger — as idiomatic
Spark DataFrame / SQL / Structured Streaming plans, plus the
large-scale-pipeline extensions (dedup families, similarity search, text
analysis, multimodal columns) mandated by BASELINE.json.

Layout:
    session    SparkSession factory tuned for the local[32] harness
    schemas    explicit StructTypes for every table (no inference)
    sources    readers: CSV descriptions, JSONL requests/responses, testdata
    sinks      writers: CSV (BOM contract), JSONL request lines
    functions  scalar/column function library (cleaning, parsing, repair,
               predicates, text analysis, time)
    operators  relational + extension operators (dedup, packing, joins,
               windows, aggregates, similarity, multimodal)
    plans      end-to-end pipeline compositions (the flagship query)
    streaming  Structured Streaming equivalents of the polling lifecycle
    ledger     append-only batch-tracking ledger + latest-wins view
    translate  LLM-as-UDF boundary (deterministic mock) + X-7 fault injection
    transport  X-1..X-4 job lifecycle as a 4-method transport protocol,
               with a file-backed implementation and the
               submit→poll→download orchestration spine
"""

__version__ = "0.1.0"
