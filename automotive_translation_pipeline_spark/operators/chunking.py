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

- ``remove_duplicate_segments``: the ACTIVE form of substring-level
  dedup — drop exact duplicate text blocks corpus-wide (first
  occurrence wins) and reassemble each document from its surviving
  blocks, the Lee et al. 2021 "dedup the substring, keep the
  document" transform on non-overlapping block boundaries.

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

from ..functions.text import normalized_text, word_shingles, word_shingles_of


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


def remove_duplicate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 16,
    packed_ids: bool | None = None,
) -> DataFrame:
    """Corpus-wide exact-duplicate-segment removal with document
    reconstruction (Lee et al. 2021's substring dedup, on fixed
    non-overlapping block boundaries).

    The normalized text is cut into consecutive ``seg_words``-word
    blocks (the final block may be short). Across the WHOLE corpus,
    every block whose exact text already occurred at a smaller
    (doc, block index) position — including earlier in the same
    document — is dropped; each document is then reassembled from its
    surviving blocks in order. Unlike document-level dedup, a document
    that shares boilerplate with an earlier one survives with the
    boilerplate cut out rather than being dropped whole.

    Output: (id, n_segments, n_kept, kept_text) for EVERY input
    document — a fully-duplicated document stays present with
    ``n_kept = 0`` and empty ``kept_text``.

    Id-domain contract (uniform with ``remove_duplicate_spans``):
    documents with a NULL id never participate in the election or the
    cutting — they pass through whole (one output row each, all
    blocks kept), rather than electing no first occurrence and being
    silently cut from every copy, or collapsing into one
    ``groupBy(null)`` row. Integral ids ride the packed-BIGINT
    HashAggregate election (``0 <= id < 2^42``, ``< 2^21`` blocks per
    document, in-plan raise otherwise); pass ``packed_ids=False`` for
    id domains outside that (snowflake-style 64-bit ids) to take the
    min(struct) election instead.

    Scale: explode is narrow (no shuffle); first-occurrence election
    rides ``dedup.first_occurrence_table`` — a packed-key
    HashAggregate on the block's md5 + a shuffle-hash join-back,
    replacing the row_number window whose whole-stream sort measured
    super-linear by sf100 (and whose partition key here was the RAW
    block text; the md5 key halves the exchange). Hot blocks cost rows
    proportional to their occurrence count, never pairwise; the
    rebuild is one keyed rollup whose order comes from ``array_sort``
    inside the aggregation buffer, not an extra sort exchange. Two
    narrow shuffles plus the join-back exchange, all linear.
    """
    if seg_words <= 0:
        raise ValueError("seg_words must be positive")
    words = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(words)
    # ceil(n / seg_words) blocks; int-int division yields DOUBLE in
    # both Spark and DuckDB, so ceil() agrees with the oracle.
    n_segs = F.ceil(n / F.lit(seg_words)).cast("long")
    # NULL-id pass-through branch (see the id-domain contract above):
    # a narrow second scan whose isNull filter pushes down to the
    # source — row groups with no null ids skip via stats, so the
    # usually-empty branch costs ~nothing at any corpus size.
    passthrough = (
        df.filter(F.col(id_col).isNull())
        .select(
            F.col(id_col),
            n_segs.alias("n_segments"),
            n_segs.alias("n_kept"),
            F.array_join(words, " ").alias("kept_text"),
        )
    )
    base = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        words.alias("__words"),
        n_segs.alias("__n_segs"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_segs - 1)).alias("seg_idx"),
    )
    segs = base.select(
        F.col(id_col),
        F.col("__n_segs"),
        F.col("seg_idx"),
        F.array_join(
            F.slice(
                F.col("__words"),
                (F.col("seg_idx") * seg_words).cast("int") + F.lit(1),
                F.lit(seg_words),
            ),
            " ",
        ).alias("seg_text"),
    )
    from .dedup import first_occurrence_table

    segs = segs.withColumn(
        "__fp", F.unhex(F.md5(F.col("seg_text").cast("binary")))
    )
    # Two consumers (election aggregate + join probe) recompute the
    # block construction — same rationale as _span_kept_words (AQE's
    # stage cache will not dedupe an explicitly shared repartition).
    firsts = first_occurrence_table(
        segs, id_col=id_col, idx_col="seg_idx", key_col="__fp",
        packed_ids=packed_ids,
    )
    flagged = segs.join(firsts.hint("shuffle_hash"), "__fp").withColumn(
        "__is_first",
        (F.col(id_col) == F.col("__d")) & (F.col("seg_idx") == F.col("__p")),
    )
    kept_struct = F.when(
        F.col("__is_first"), F.struct(F.col("seg_idx"), F.col("seg_text"))
    )  # NULL otherwise; collect_list drops NULLs
    deduped = flagged.groupBy(id_col).agg(
        F.first("__n_segs").alias("n_segments"),
        F.coalesce(
            F.sum(F.when(F.col("__is_first"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["seg_text"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return deduped.unionByName(passthrough)


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
    (1) groupBy(seg_md5, id) with count — Spark's partial aggregation
    collapses within-doc repeats map-side before the shuffle, and the
    16-byte md5 key (the segment text itself is never needed
    downstream) keeps every exchange narrow; (2) the multi-doc flag
    comes from a HashAggregate over those already-aggregated pairs
    joined back with shuffle_hash — NOT a window count, whose
    whole-stream sort by the partition key measured super-linear by
    sf100 on the span family (the left join keeps single-doc pairs,
    null-flagged); (3) the per-doc rollup weights each pair by its
    position count. Three keyed shuffles, all over pre-aggregated
    narrow rows; a hot segment costs rows proportional to its distinct
    docs, never pairwise. The repartition decouples shingle-hash
    parallelism from the scan's file layout (same rationale as
    minhash_lsh_candidates).
    """
    ex = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(F.col(id_col))
        # Round 10 (guide §4.2): word array staged as a real column so
        # the interpreted shingle expression does not re-run
        # split(regexp) per reference per row (see lsh_banded_table).
        .select(
            F.col(id_col),
            F.split(normalized_text(F.col(text_col)), " ").alias("__wrds"),
        )
        .select(
            F.col(id_col),
            F.explode(word_shingles_of(F.col("__wrds"), k)).alias("seg"),
        )
        .select(
            id_col, F.unhex(F.md5(F.col("seg").cast("binary"))).alias("__fp")
        )
    )
    pairs = ex.groupBy("__fp", id_col).agg(
        F.count(F.lit(1)).alias("__n_pos")
    )
    # Two consumers of the collapsed pairs (multi-doc aggregate + join
    # probe) recompute them — see _span_kept_words for the rationale.
    multi = (
        pairs.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") > 1)
    )
    flagged = pairs.join(multi.hint("shuffle_hash"), "__fp", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sum("__n_pos").alias("n_segments"),
            F.coalesce(
                F.sum(F.when(F.col("__nd").isNotNull(), F.col("__n_pos"))),
                F.lit(0),
            ).alias("dup_segments"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_segments") / F.col("n_segments"), 4),
        )
    )
