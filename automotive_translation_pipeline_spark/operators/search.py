"""Full-text keyword search: inverted postings + BM25 top-k ranking.

The reference pipeline selects work by exact predicates only; a corpus
engine additionally needs keyword retrieval over the document store
(finding training documents by content, auditing what a filter kept).
The distributable form of that is the classic inverted index: the
corpus collapses once to (term, doc, tf) postings, corpus statistics
(document frequency, document length) attach as windows over those
postings, and a query is a BROADCAST of its handful of terms joined
against the postings — never a scan of the corpus per query.

Scale shape:
- One corpus scan, word-exploded and immediately collapsed map-side to
  (word, doc_id, tf) — the same discipline as operators/lm.py.
- df(word) and dl(doc) are windows over the postings (two keyed
  shuffles of the collapsed pairs, not of the raw corpus).
- N and avgdl are a 1-row aggregate broadcast back in-plan (no
  driver collect).
- The query set is tiny by contract and broadcast; scoring aggregates
  only the candidate postings that share a term with some query.
- Top-k per query is a window partitioned BY QUERY — bounded state.
At 100 TB the postings themselves would persist as a bucketed-by-word
table (the "index build"); ``build_postings`` is that seam — the
scoring path below it is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, doc_id, tf) postings from one corpus scan.

    Normalization matches the dedup/LM family (lowercase, collapsed
    whitespace) so index terms and query terms agree. An empty document
    normalizes to a single empty-string token, identically on the
    DuckDB oracle side.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("word"),
    )
    return words.groupBy("word", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 4,
) -> DataFrame:
    """BM25 top-k documents per query.

    score(q, d) = sum over distinct terms t of q present in d of
      idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
      idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    Output: (query_id, doc_id, score) with row_number-by-rounded-score
    top-k (doc_id tie-break) so ranking is deterministic and
    engine-portable.
    """
    postings = build_postings(docs, text_col=text_col, id_col=id_col)
    stats = postings.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("word")).cast("double")
    ).withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("double")
    )

    # Corpus scalars: every document contributes >= 1 posting (empty
    # text normalizes to one empty-string token), so N and the token
    # total both reduce from the postings — one tiny row broadcast
    # back into the plan.
    corpus = postings.agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs"),
        F.sum("tf").cast("double").alias("total_tokens"),
    )

    qdf = spark.createDataFrame(queries, ["query_id", "qtext"])
    qterms = qdf.select(
        "query_id",
        F.explode(F.split(normalized_text(F.col("qtext")), " ")).alias("word"),
    ).distinct()

    cand = stats.join(F.broadcast(qterms), "word").crossJoin(F.broadcast(corpus))
    avgdl = F.col("total_tokens") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(idf * tf_part), ndigits).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    topk: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack et al.):
    rrf(d) = sum over systems of 1 / (k + rank_d). The standard hybrid
    of lexical (BM25) and vector (ANN) retrieval — rank-based, so
    incomparable score scales fuse without calibration.

    Each input must carry (query_id, doc_id, rank) with rank 1-based
    and deterministic. The union is a per-query rollup: shuffle keys
    are (query_id, doc_id), per-query state is bounded by the fused
    candidate pool, and the final top-k is a per-query window —
    nothing corpus-wide anywhere.

    Returns (query_id, doc_id, rrf_score, fused_rank), fused_rank
    row_numbered by (rounded score DESC, doc_id) for engine-portable
    determinism.
    """
    from functools import reduce

    contribs = [
        r.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("__c"),
        )
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionAll(b), contribs)
    scored = unioned.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__c"), ndigits).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= topk)
    )
