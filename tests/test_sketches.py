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


def test_hll_sketches_merge_and_match_exact(spark, sf_dir):
    """HLL sketch law: union of per-group sketches and one whole-table
    sketch both estimate the true distinct count within HLL's error
    bound. (They need not be byte-identical: the union path may settle
    on a different internal representation, so estimates can differ by
    a few counts — e.g. 497 vs 501 on ~500 true distincts. The
    re-aggregation CONTRACT is bounded error, not bit equality.)"""
    from automotive_translation_pipeline_spark.functions.text import (
        doc_fingerprint,
    )

    docs = load_testdata(spark, sf_dir)["documents"].select(
        "lang", doc_fingerprint(F.col("text")).alias("fp")
    )
    per_group = docs.groupBy("lang").agg(F.hll_sketch_agg("fp").alias("sk"))
    merged_est = (
        per_group.agg(F.hll_union_agg("sk").alias("u"))
        .select(F.hll_sketch_estimate("u").alias("est"))
        .first()["est"]
    )
    whole_est = docs.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("fp")).alias("est")
    ).first()["est"]
    exact = docs.select("fp").distinct().count()
    assert exact > 0, "documents fixture yielded no distinct fingerprints"
    # lgConfigK=12 → relative standard error ~1.04/sqrt(4096) ≈ 1.6%;
    # 3 sigma ≈ 5%. Both paths must land inside it.
    for est in (merged_est, whole_est):
        assert abs(est - exact) / exact < 0.05, (est, exact)
