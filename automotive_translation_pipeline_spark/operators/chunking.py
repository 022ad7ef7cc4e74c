"""Token-window document chunking and repeated-segment analysis.

Two curation primitives every LLM training-data pipeline needs on top
of the reference's whole-document batching (the reference packs entire
description files into API batches — ``auto_translate.py:524-600``'s
token-budget loop; chunking is the finer-grained version of the same
token-budget discipline applied WITHIN a document):

- ``chunk_documents``: split each document into fixed-size token
  windows with a configurable stride (overlap), the standard
  pre-tokenization step for context-window-bounded training and for
  embedding long documents. Pure narrow operations — split / sequence /
  explode / slice — so the plan has NO shuffle and NO Python: chunking
  100 TB is embarrassingly parallel and stays inside whole-stage
  codegen.

- ``segment_dup_stats``: per-document duplicated-segment fraction —
  the fraction of k-token windows (at every word offset) that also
  occur in at least one OTHER document. This is the document-level
  signal behind substring-level dedup (Lee et al., "Deduplicating
  Training Data Makes Language Models Better") and the
  duplicate-text-fraction quality gates in Gopher/RefinedWeb: a high
  fraction means the document is mostly boilerplate shared with the
  rest of the corpus. Shapes: one shuffle to count distinct docs per
  segment, a co-partitioned join back (Spark reuses the exchange), and
  one keyed shuffle to the per-doc rollup — all linear in corpus size,
  no pairwise blowup (the join is row-to-frequency, never doc-to-doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, word_shingles


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding token-window chunks over the normalized text.

    Chunk ``i`` covers words ``[i*stride, i*stride + chunk_tokens)``
    (0-based); the last chunk starts at the smallest multiple of
    ``stride`` whose window reaches the end of the document, so every
    word lands in at least one chunk and consecutive chunks overlap by
    ``chunk_tokens - stride`` words. A document with at most
    ``chunk_tokens`` words yields exactly one chunk.

    Output: (id, chunk_idx, chunk_text, n_tokens) with ``n_tokens`` the
    actual window size (the final chunk may be short).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    words = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(words)
    # Number of extra starts beyond chunk 0: ceil((n - chunk) / stride),
    # clamped at 0 for short docs. Int-int division yields DOUBLE in
    # both Spark and DuckDB, so ceil() agrees with the oracle.
    last_start = F.greatest(
        F.lit(0).cast("long"),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)),
    )
    base = df.select(
        F.col(id_col),
        words.alias("__words"),
        n.cast("long").alias("__n"),
        F.explode(F.sequence(F.lit(0).cast("long"), last_start)).alias("chunk_idx"),
    )
    start0 = (F.col("chunk_idx") * stride).cast("int")  # 0-based word offset
    return base.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.array_join(
            F.slice(F.col("__words"), start0 + F.lit(1), F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens).cast("long"), F.col("__n") - start0).alias(
            "n_tokens"
        ),
    )


def segment_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document repeated-segment statistics.

    A "segment" is a k-word window at every word offset (the same
    shingle construction as MinHash, positions kept — NOT distinct).
    ``dup_segments`` counts positions whose segment occurs in >= 2
    distinct documents; ``dup_frac`` is the duplicated fraction.
    Documents with fewer than ``k`` words have no segments and are
    absent from the output (same contract as the shingle-based dedup
    operators).

    Scale: ONE pass over the exploded segments — the corpus is never
    scanned or shingled twice, and there is no doc-to-frequency join at
    all (a naive freq-table join either broadcasts a corpus-sized
    per-segment table or re-explodes the probe side). Instead:
    (1) groupBy(seg, id) with count — Spark's partial aggregation
    collapses within-doc repeats map-side before the shuffle; (2) the
    distinct-doc count per segment is a window count over those
    already-aggregated pairs (one row per (seg, doc), so the partition
    is exactly the segment's doc list — bounded by corpus doc count,
    no position blowup); (3) the per-doc rollup weights each pair by
    its position count. Three keyed shuffles, all over pre-aggregated
    rows; a hot segment costs rows proportional to its distinct docs,
    never pairwise. The repartition decouples shingle-hash parallelism
    from the scan's file layout (same rationale as
    minhash_lsh_candidates).
    """
    from pyspark.sql import Window

    ex = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(F.col(id_col))
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), k)).alias("seg"),
        )
    )
    pairs = ex.groupBy("seg", id_col).agg(F.count(F.lit(1)).alias("__n_pos"))
    with_nd = pairs.withColumn(
        "__nd", F.count(F.lit(1)).over(Window.partitionBy("seg"))
    )
    return (
        with_nd.groupBy(id_col)
        .agg(
            F.sum("__n_pos").alias("n_segments"),
            F.coalesce(
                F.sum(F.when(F.col("__nd") > 1, F.col("__n_pos"))), F.lit(0)
            ).alias("dup_segments"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_segments") / F.col("n_segments"), 4),
        )
    )
