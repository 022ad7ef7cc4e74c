"""Corpus language-model scoring for quality filtering.

CCNet (Wenzek et al. 2019) ranks web documents by LM perplexity and
keeps the low-perplexity head; at corpus scale the cheap, fully
distributable stand-in is a unigram model trained on the corpus itself:
score each document by the mean negative log-probability of its words
under the corpus unigram distribution. Low surprisal = common/
boilerplate text, high surprisal = rare vocabulary (or noise) — both
tails are useful gates, and the score is a pure function of the corpus
so it replays deterministically.

Scale shape (same discipline as segment_dup_stats): the corpus is
scanned and word-exploded exactly ONCE, immediately collapsed to
(word, doc, count) pairs by a partially-aggregated groupBy (map-side
combine), and every downstream step — per-word corpus frequency
(window over the pairs), the global total (1-row aggregate broadcast
back in-plan), and the per-doc weighted rollup — runs over those
pre-aggregated pairs. No vocabulary-sized join against the exploded
stream, no driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 4,
) -> DataFrame:
    """Per-document mean unigram surprisal, -mean(ln p(word)), under
    the corpus's own unigram distribution.

    Output: (id, n_words, avg_surprisal). A uniform-vocabulary corpus
    scores exactly ln(V) everywhere; documents of corpus-rare words
    score higher. Empty documents normalize to a single empty-string
    token and participate like any other word (identical on the oracle
    side).
    """
    words = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(F.col(id_col))
        .select(
            F.col(id_col),
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("word"),
        )
    )
    pairs = words.groupBy("word", id_col).agg(F.count(F.lit(1)).alias("__n"))
    with_wc = pairs.withColumn(
        "__wc", F.sum("__n").over(Window.partitionBy("word"))
    )
    # -mean(ln(wc/total)) = ln(total) - mean(ln(wc)): factoring the
    # global total OUT of the per-word term lets the whole corpus-side
    # computation finish in one pass, leaving total as a 1-row reduce
    # over the PER-DOC aggregate (one row per document — the cheap
    # thing to persist; deriving total from the pairs directly would
    # either re-run the scan+explode branch or cache the pairs, both
    # corpus-sized costs).
    per_doc = (
        with_wc.groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_words"),
            (F.sum(F.col("__n") * F.log(F.col("__wc"))) / F.sum("__n")).alias(
                "__mean_ln_wc"
            ),
        )
        .persist()
    )
    total = per_doc.agg(F.sum("n_words").alias("__total"))
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("n_words"),
        F.round(
            F.log(F.col("__total")) - F.col("__mean_ln_wc"), ndigits
        ).alias("avg_surprisal"),
    )
