"""Round-10 hardening: unigram byte-gate, bigram fp-collision guard,
bench probe hygiene (ADVICE r9 items)."""

from __future__ import annotations

import os

from automotive_translation_pipeline_spark.operators import lm
from automotive_translation_pipeline_spark.operators.lm import (
    bigram_surprisal,
    unigram_surprisal,
)


def _docs(spark):
    rows = [(1, "alpha beta alpha"), (2, "beta gamma"), (3, "alpha")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_unigram_byte_gate_forces_fallback(spark, monkeypatch):
    """A vocabulary under the ROW gate but over the BYTE gate must take
    the shuffle-hash fallback: the row constant assumed bigram-shaped
    16-byte rows, but words are variable-length strings (ADVICE r9)."""
    df = _docs(spark)
    monkeypatch.setattr(lm, "UNIGRAM_BROADCAST_MAX_BYTES", 0)
    plan = _plan(unigram_surprisal(df))
    assert "BroadcastHashJoin" not in plan
    # Values identical on both paths.
    monkeypatch.setattr(lm, "UNIGRAM_BROADCAST_MAX_BYTES", 1 << 40)
    narrow = {
        r.doc_id: r.avg_surprisal
        for r in unigram_surprisal(df).collect()
    }
    monkeypatch.setattr(lm, "UNIGRAM_BROADCAST_MAX_BYTES", 0)
    wide = {
        r.doc_id: r.avg_surprisal
        for r in unigram_surprisal(df).collect()
    }
    assert narrow == wide


def test_unigram_byte_gate_allows_broadcast_for_small_vocab(spark):
    plan = _plan(unigram_surprisal(_docs(spark)))
    assert "BroadcastHashJoin" in plan


def test_bigram_fp_check_passes_on_clean_corpus(spark, monkeypatch):
    """The opt-in collision guard runs its extra pass and stays silent
    when the hashed vocabulary is injective on this corpus."""
    monkeypatch.setenv("SPARK_GRAFT_BIGRAM_FP_CHECK", "1")
    rows = [(1, "a b a b"), (2, "b a")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.n_bigrams for r in bigram_surprisal(df).collect()}
    assert out == {1: 3, 2: 1}


def test_bigram_fp_check_flag_parsing(monkeypatch):
    for val, want in (("1", True), ("true", True), ("yes", True),
                      ("0", False), ("", False)):
        monkeypatch.setenv("SPARK_GRAFT_BIGRAM_FP_CHECK", val)
        assert lm._bigram_fp_check_enabled() is want
    monkeypatch.delenv("SPARK_GRAFT_BIGRAM_FP_CHECK")
    assert lm._bigram_fp_check_enabled() is False


def test_io_probe_scratch_is_pid_suffixed():
    """Concurrent bench/pin_baseline/spot processes must not share (and
    delete) each other's probe scratch file (ADVICE r9)."""
    import bench

    assert str(os.getpid()) in bench._IO_PROBE_SCRATCH


def test_io_probe_runs():
    import bench

    v = bench.io_probe()
    assert isinstance(v, float) and v >= 0


def test_frozen_pq_codebook_shape_and_provenance():
    """The committed codebook must stay 8x32x8 (the oracle SQL inlines
    these dims) and carry its training provenance."""
    import json
    import os

    from automotive_translation_pipeline_spark.operators.similarity import (
        frozen_pq_codebook,
    )

    cb = frozen_pq_codebook()
    assert len(cb) == 8
    assert all(len(sub) == 32 for sub in cb)
    assert all(len(c) == 8 for sub in cb for c in sub)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "automotive_translation_pipeline_spark",
        "resources",
        "pq_codebook_v1.json",
    )
    prov = json.load(open(path))["provenance"]
    assert prov["tool"] == "tools/train_pq_codebook.py"
    assert prov["seed"] == 42


def test_pq_frozen_codebook_skips_training(spark, sf_dir, monkeypatch):
    """Passing a codebook must not re-train (no limit/collect pass)."""
    from automotive_translation_pipeline_spark.operators import similarity
    from automotive_translation_pipeline_spark.operators.similarity import (
        cosine_topk_pq,
        frozen_pq_codebook,
    )
    from automotive_translation_pipeline_spark.sources import load_testdata
    from pyspark.sql import functions as F

    def _boom(*a, **k):
        raise AssertionError("build_pq_codebook called despite codebook=")

    monkeypatch.setattr(similarity, "build_pq_codebook", _boom)
    emb = load_testdata(spark, sf_dir)["embeddings"]
    out = cosine_topk_pq(
        emb, emb.filter(F.col("vec_id") < 2), k=5, rerank=16,
        codebook=frozen_pq_codebook(),
    )
    assert out.count() > 0
