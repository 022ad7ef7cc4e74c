"""chunk_documents / segment_dup_stats unit + plan-shape tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from automotive_translation_pipeline_spark.operators.chunking import (
    chunk_documents,
    segment_dup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "a b c")])
    out = chunk_documents(df, chunk_tokens=4, stride=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_idx, r.chunk_text, r.n_tokens) == (0, "a b c", 3)


def test_chunk_exact_boundary_no_empty_tail(spark):
    # 8 words, chunk 4 stride 4: exactly two full chunks, no third.
    df = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6 w7 w8")])
    out = sorted(chunk_documents(df, chunk_tokens=4, stride=4).collect(),
                 key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.chunk_text, r.n_tokens) for r in out] == [
        (0, "w1 w2 w3 w4", 4),
        (1, "w5 w6 w7 w8", 4),
    ]


def test_chunk_overlap_covers_every_word(spark):
    words = [f"t{i}" for i in range(50)]
    df = _docs(spark, [(7, " ".join(words))])
    out = sorted(chunk_documents(df, chunk_tokens=32, stride=24).collect(),
                 key=lambda r: r.chunk_idx)
    # ceil((50-32)/24) = 1 -> chunks at offsets 0 and 24.
    assert [r.chunk_idx for r in out] == [0, 1]
    assert out[0].chunk_text.split(" ") == words[0:32]
    assert out[1].chunk_text.split(" ") == words[24:50]
    assert out[1].n_tokens == 26
    covered = set(out[0].chunk_text.split()) | set(out[1].chunk_text.split())
    assert covered == set(words)
    # Overlap is chunk - stride = 8 words.
    assert len(set(out[0].chunk_text.split()) & set(out[1].chunk_text.split())) == 8


def test_chunk_normalizes_whitespace_and_case(spark):
    df = _docs(spark, [(1, "  Foo   BAR\tbaz  ")])
    r = chunk_documents(df, chunk_tokens=10, stride=10).collect()[0]
    assert r.chunk_text == "foo bar baz"
    assert r.n_tokens == 3


def test_chunk_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_chunk_plan_has_no_shuffle(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_segment_dup_sort_free_pass(spark):
    # Scale contract (round 7): the multi-doc flag must come from a
    # HashAggregate + shuffle-hash join over the collapsed (md5, doc)
    # pairs — never a window count (whole-stream sort by the partition
    # key; the span family measured that sort 10.7x for 3.3x data at
    # sf100) and never a sort-merge join or a broadcast of the
    # pair stream. The price is a second shingle explode (one per
    # pair consumer) — deliberate: recompute is shuffle-free map work,
    # the sort is not.
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(12)))])
    plan = segment_dup_stats(df, k=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 2
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_segment_dup_stats_planted_dup(spark):
    base = " ".join(f"w{i}" for i in range(10))  # 10 words -> 3 8-seg positions
    other = " ".join(f"u{i}" for i in range(10))
    df = _docs(spark, [(1, base), (2, base), (3, other)])
    out = {r.doc_id: r for r in segment_dup_stats(df, k=8).collect()}
    assert out[1].n_segments == 3 and out[1].dup_segments == 3
    assert out[1].dup_frac == 1.0
    assert out[3].dup_segments == 0 and out[3].dup_frac == 0.0


def test_segment_dup_stats_partial_overlap(spark):
    # Doc 2 shares exactly its first 8 words with doc 1, then diverges:
    # doc 2 has 9 words -> 2 segments, of which 1 (offset 0) is shared.
    shared = [f"s{i}" for i in range(8)]
    df = _docs(
        spark,
        [
            (1, " ".join(shared + ["a", "b", "c"])),
            (2, " ".join(shared + ["z"])),
        ],
    )
    out = {r.doc_id: r for r in segment_dup_stats(df, k=8).collect()}
    assert out[2].n_segments == 2
    assert out[2].dup_segments == 1
    assert out[2].dup_frac == 0.5


def test_segment_dup_short_docs_absent(spark):
    df = _docs(spark, [(1, "only three words"), (2, " ".join(["x"] * 20))])
    ids = {r.doc_id for r in segment_dup_stats(df, k=8).collect()}
    assert ids == {2}


def test_segment_dup_repeat_within_one_doc_not_dup(spark):
    # The same segment occurring twice INSIDE one doc is not a cross-doc
    # duplicate: nd counts distinct docs.
    txt = " ".join([f"r{i}" for i in range(8)] * 2)  # 16 words, repeats
    df = _docs(spark, [(1, txt)])
    r = segment_dup_stats(df, k=8).collect()[0]
    assert r.dup_segments == 0
