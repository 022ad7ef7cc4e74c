"""Count-min heavy hitters (operators/sketches.py): accuracy vs the
exact aggregation, overestimate-only bound, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from automotive_translation_pipeline_spark.operators.sketches import (
    topk_heavy_hitters_cms,
)
from automotive_translation_pipeline_spark.sources import load_testdata


def _words(spark, sf_dir):
    return load_testdata(spark, sf_dir)["documents"].select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    )


def test_cms_matches_exact_topk(spark, sf_dir):
    words = _words(spark, sf_dir)
    exact = {
        r.w: r.n
        for r in words.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(10)
        .collect()
    }
    got = topk_heavy_hitters_cms(words.repartition(8), "w", k=10)
    got_words = {w for w, _ in got}
    # recall against the exact top-10 (ties at the boundary may swap)
    assert len(got_words & set(exact)) >= 8
    # count-min never under-counts
    for w, est in got:
        if w in exact:
            assert est >= exact[w]
            # width 8192 over this vocab: estimates should be tight
            assert est <= exact[w] * 1.2 + 10


def test_cms_deterministic_across_runs(spark, sf_dir):
    words = _words(spark, sf_dir)
    a = topk_heavy_hitters_cms(words.repartition(4), "w", k=5)
    b = topk_heavy_hitters_cms(words.repartition(7), "w", k=5)
    # partitioning changes sketch distribution but not the merged sums
    assert [w for w, _ in a] == [w for w, _ in b]
    assert a == b


def test_cms_empty_input(spark):
    empty = spark.createDataFrame([], "w string")
    assert topk_heavy_hitters_cms(empty, "w", k=5) == []


def test_cosine_arrow_matches_bruteforce(spark, sf_dir):
    """The Arrow matmul kernel must reproduce the brute-force scores
    bit-for-bit at rounded precision, including tie-breaks."""
    from automotive_translation_pipeline_spark.operators.similarity import (
        cosine_topk_arrow,
        cosine_topk_bruteforce,
    )
    import pyspark.sql.functions as F

    emb = load_testdata(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < 8)
    bf = {
        (r.query_id, r.vec_id): round(r.cosine, 9)
        for r in cosine_topk_bruteforce(emb.repartition(5), q, k=7).collect()
    }
    ar = {
        (r.query_id, r.vec_id): round(r.cosine, 9)
        for r in cosine_topk_arrow(emb.repartition(5), q, k=7).collect()
    }
    assert bf == ar
