"""unigram_surprisal unit + plan-shape tests."""

from __future__ import annotations

import math

from automotive_translation_pipeline_spark.operators.lm import unigram_surprisal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_uniform_vocabulary_scores_ln_v(spark):
    # 4 distinct words, each appearing exactly once -> p = 1/4 for all,
    # so every document scores exactly ln(4).
    df = _docs(spark, [(1, "a b"), (2, "c d")])
    out = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert out[1].n_words == 2
    assert abs(out[1].avg_surprisal - round(math.log(4), 4)) < 1e-9
    assert out[1].avg_surprisal == out[2].avg_surprisal


def test_rare_words_score_higher_than_common(spark):
    # 'x' dominates the corpus; the all-x doc must score lower than the
    # doc of singletons.
    df = _docs(spark, [(1, "x x x x x x"), (2, "q r s t u v")])
    out = {r.doc_id: r.avg_surprisal for r in unigram_surprisal(df).collect()}
    assert out[1] < out[2]


def test_exact_values_small_corpus(spark):
    # corpus: a a b  -> p(a)=2/3, p(b)=1/3
    df = _docs(spark, [(1, "a a"), (2, "b")])
    out = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert out[1].avg_surprisal == round(-math.log(2 / 3), 4)
    assert out[2].avg_surprisal == round(-math.log(1 / 3), 4)
    assert out[1].n_words == 2 and out[2].n_words == 1


def test_within_doc_repeats_weighted(spark):
    # doc 1 = "a a b": mean over 3 positions, not 2 distinct words.
    df = _docs(spark, [(1, "a a b"), (2, "c")])
    r = {x.doc_id: x for x in unigram_surprisal(df).collect()}[1]
    pa, pb = 2 / 4, 1 / 4
    expected = round((2 * -math.log(pa) + 1 * -math.log(pb)) / 3, 4)
    assert r.avg_surprisal == expected
    assert r.n_words == 3


def test_single_corpus_scan_no_join_on_exploded(spark):
    # Scale contract: the corpus-side pipeline (scan -> explode ->
    # pairs -> window -> per-doc rollup) materializes ONCE as the
    # persisted per-doc aggregate; both the result branch and the
    # global-total branch must read that cache (2 InMemoryTableScans of
    # the same relation), not re-run the explode.
    df = _docs(spark, [(1, "a b c")])
    plan = unigram_surprisal(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") == 2


def test_deterministic_across_runs(spark):
    df = _docs(spark, [(i, f"w{i % 3} w{i % 5} common") for i in range(30)])
    a = sorted(unigram_surprisal(df).collect())
    b = sorted(unigram_surprisal(df).collect())
    assert a == b
