"""The flagship end-to-end plan (SURVEY §3.1 / §7 Milestone 1):

    scan → filter/trim → anti-join dedup → token-aware pack →
    translate (grouped UDF) → parse cascade → re-join + sentinel →
    quality flags (suspicious / shift) → run summary

This is the reference's whole ``run_translation_pipeline``
(``auto_translate.py:1761-1857``) as ONE declarative DataFrame plan:
Catalyst fuses the scan/filter/projection, the pack is a per-shard
window, the translate step is the only Python barrier, and everything
after it is joins/windows/aggregates that AQE sizes at runtime.

Scale shape: shuffles are (1) the pack window on (shard), (2) the
groupBy(batch_id) materialization, (3) the re-join on
(batch_id, description_id). All key-partitioned; nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parsing import parse_translations
from ..functions.predicates import is_suspicious, is_truncated
from ..functions.repair import repair_json_udf
from ..operators.aggregates import run_summary
from ..operators.dedup import anti_join_dedup
from ..operators.joins import rejoin_results
from ..operators.packing import (
    assign_batches_cumsum,
    materialize_requests,
    with_cost,
)
from ..operators.windows import shift_flags
from ..sources import load_testdata
from ..translate import translate_requests


def translate_docs(todo: DataFrame, limit: int = 4000) -> DataFrame:
    """The reusable pipeline core: pack → translate → parse/repair →
    re-join → quality flags.

    ``todo`` must carry (description_id, english_sentence, shard, seq)
    — already filtered and deduplicated. Both the batch flagship and
    the streaming flagship (streaming/flagship.py, per micro-batch) run
    exactly this fragment.
    """
    # R-17/R-18: token-cost pack (per-shard) + materialize.
    costed = with_cost(todo, "english_sentence")
    assigned = assign_batches_cumsum(
        costed, order_col="seq", limit=limit, shard_col="shard"
    )
    # The batch assignment feeds BOTH the request materialization and
    # the expected-rows join side; unpersisted, Spark recomputes the
    # scan→filter→anti-join→window chain per consumer (4 source scans
    # in the physical plan). Persist is the staging point — the
    # reference kept this same artifact in driver memory
    # (auto_translate.py:340,932-935); on a cluster it's a
    # MEMORY_AND_DISK cache or an intermediate table write.
    assigned = assigned.persist()
    requests = materialize_requests(assigned)

    # X-5: the grouped translate map (mock in the harness).
    responses = translate_requests(requests)

    # F-13 → F-7/F-8: repair-then-parse cascade, exploded to rows.
    # The repair UDF is materialized in its own projection: Spark's
    # ExtractPythonUDFs then runs it as one Arrow stage, and the native
    # parse cascade (which uses higher-order lambdas) reads its output
    # as a plain attribute — a UDF nested inside a lambda is unsupported.
    # The native is_truncated gate keeps Python off the healthy rows:
    # repair_content() only acts on blobs is_truncated() covers, so
    # gating is exactly semantics-preserving and at scale the Arrow
    # stage sees only the (rare) damaged batches.
    repaired = responses.select(
        F.col("custom_id").alias("batch_id"),
        F.when(
            is_truncated(F.col("content")),
            F.coalesce(repair_json_udf(F.col("content")), F.col("content")),
        )
        .otherwise(F.col("content"))
        .alias("repaired_content"),
    )
    parsed = repaired.select(
        "batch_id",
        F.explode(parse_translations(F.col("repaired_content"))).alias(
            "description_id", "translation"
        ),
    )

    # R-13/R-14: join back onto expected rows; NULL marks failure.
    expected = assigned.select(
        "batch_id", "description_id", "english_sentence", "seq"
    )
    joined = rejoin_results(expected, parsed)

    # R-10 + R-26/R-27: quality flags.
    flagged = joined.withColumn(
        "is_failed", F.col("translation").isNull()
    ).withColumn("is_suspicious", is_suspicious(F.col("translation")))
    return shift_flags(flagged, batch_col="batch_id", order_col="seq")


def translation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    done_mod: int = 7,
    limit: int = 4000,
) -> DataFrame:
    """Row-level flagship output: one row per surviving input document
    with its (mock) translation and quality flags.

    The `documents` table plays the descriptions CSV; docs whose id is
    ``0 mod done_mod`` play the already-translated table for the R-12
    anti-join (deterministic, so the DuckDB oracle can reproduce it).
    """
    t = load_testdata(spark, sf_dir)
    docs = t["documents"].select(
        F.col("doc_id").cast("string").alias("description_id"),
        F.col("text").alias("english_sentence"),
        F.col("lang").alias("shard"),
        F.col("doc_id").alias("seq"),
    )
    # R-7: non-empty filter + trim.
    docs = docs.filter(F.length(F.trim(F.col("english_sentence"))) > 0).withColumn(
        "english_sentence", F.trim(F.col("english_sentence"))
    )
    # R-12: anti-join against the already-done set.
    done = docs.filter(F.col("seq") % done_mod == 0).select("description_id")
    todo = anti_join_dedup(docs, done)
    return translate_docs(todo, limit=limit)


def translation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-20 run summary over the flagship pipeline — the ``entry()``
    DataFrame."""
    return run_summary(translation_pipeline(spark, sf_dir))
