"""Round-6 additions: exact duplicated-span detection (Lee et al.
2022 style) and DSIR importance weights (Xie et al. 2023)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automotive_translation_pipeline_spark.operators.dedup import (
    duplicate_spans,
)
from automotive_translation_pipeline_spark.operators.sampling import (
    dsir_importance_weights,
)


def _docs(spark, rows, schema="doc_id bigint, text string"):
    return spark.createDataFrame(rows, schema)


# --- duplicate_spans ------------------------------------------------------


def test_duplicate_spans_cross_doc_shared_window(spark):
    # Docs 1 and 2 share one exact 8-word run ("w1..w8"); doc 3 is
    # unrelated. The shared run is one maximal span in each doc.
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = _docs(
        spark,
        [
            (1, shared + " tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8"),
            (2, "head1 head2 head3 head4 head5 head6 head7 head8 " + shared),
            (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
        ],
    )
    out = {r.doc_id: r for r in duplicate_spans(df, k=8).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_spans == 1 and out[1].dup_words == 8
    assert out[2].n_spans == 1 and out[2].dup_words == 8
    assert out[1].max_span == 8


def test_duplicate_spans_overlapping_windows_merge(spark):
    # Docs share a 10-word run -> three overlapping duplicated 8-word
    # windows per doc, which must merge into ONE 10-word span.
    run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    df = _docs(
        spark,
        [
            (1, run + " t1 t2 t3 t4 t5 t6 t7 t8"),
            (2, "h1 h2 h3 h4 h5 h6 h7 h8 " + run),
        ],
    )
    out = {r.doc_id: r for r in duplicate_spans(df, k=8).collect()}
    assert out[1].n_spans == 1 and out[1].dup_words == 10
    assert out[2].n_spans == 1 and out[2].dup_words == 10


def test_duplicate_spans_within_doc_repeat_counts(spark):
    # A doc that repeats its own 8-word block twice is duplicated text
    # even with no other document involved; the two non-touching
    # copies stay separate spans.
    blk = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = _docs(
        spark,
        [(1, blk + " m1 m2 m3 m4 m5 m6 m7 m8 m9 " + blk)],
    )
    out = duplicate_spans(df, k=8).collect()
    assert len(out) == 1
    assert out[0].n_spans == 2 and out[0].dup_words == 16
    assert out[0].max_span == 8


def test_duplicate_spans_short_docs_drop_out(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert duplicate_spans(df, k=8).collect() == []


# --- dsir_importance_weights ----------------------------------------------


def test_dsir_target_like_docs_score_positive(spark):
    # Target = docs 1-2 ("english-ish" vocabulary); doc 3 shares it,
    # doc 4 is disjoint vocabulary. Doc 3 must outscore doc 4.
    df = spark.createDataFrame(
        [
            (1, "en", "the cat sat on the mat"),
            (2, "en", "the dog sat on the rug"),
            (3, "xx", "the cat sat on the rug"),
            (4, "xx", "zork blag frum blag zork quux"),
        ],
        "doc_id bigint, lang string, text string",
    )
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(
            df, F.col("lang") == "en"
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[3].log_weight > out[4].log_weight
    assert out[4].log_weight < 0


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    # 4 words -> 4 unigrams + 3 bigrams = 7 features.
    df = spark.createDataFrame(
        [(1, True, "a b c d")], "doc_id bigint, tgt boolean, text string"
    )
    out = dsir_importance_weights(df, F.col("tgt")).collect()
    assert out[0].n_feats == 7


def test_dsir_single_word_doc_has_one_feature(spark):
    df = spark.createDataFrame(
        [(1, True, "hello"), (2, False, "hello world")],
        "doc_id bigint, tgt boolean, text string",
    )
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(df, F.col("tgt")).collect()
    }
    assert out[1].n_feats == 1
    assert out[2].n_feats == 3


# --- remove_duplicate_spans -------------------------------------------------


def test_remove_spans_canonical_first_occurrence_survives(spark):
    # Lowest (doc_id, position) per fingerprint is canonical: doc 1
    # keeps the shared run, doc 2 loses exactly those 8 words.
    from automotive_translation_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = _docs(
        spark,
        [
            (1, shared + " t1 t2 t3 t4 t5 t6 t7 t8"),
            (2, "h1 h2 h3 h4 h5 h6 h7 h8 " + shared),
        ],
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, k=8).collect()}
    assert out[1].removed_words == 0 and out[1].kept_words == 16
    assert out[2].removed_words == 8 and out[2].kept_words == 8


def test_remove_spans_fully_duplicated_doc_empties(spark):
    # Doc 2 is an exact copy of doc 1: every window is redundant, the
    # whole doc is cut, and kept_md5 is md5 of the empty string on
    # both engines (the DuckDB oracle needs the coalesce for this).
    import hashlib

    from automotive_translation_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    text = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    df = _docs(spark, [(1, text), (2, text)])
    out = {r.doc_id: r for r in remove_duplicate_spans(df, k=8).collect()}
    assert out[1].kept_words == 10 and out[1].removed_words == 0
    assert out[2].kept_words == 0 and out[2].removed_words == 10
    assert out[2].kept_md5 == hashlib.md5(b"").hexdigest()


def test_remove_spans_within_doc_repeat_keeps_first(spark):
    from automotive_translation_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    blk = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = _docs(spark, [(1, blk + " mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8 mid9 " + blk)])
    out = remove_duplicate_spans(df, k=8).collect()[0]
    assert out.n_words == 25
    assert out.removed_words == 8 and out.kept_words == 17


# --- winnow_fingerprint_pairs -----------------------------------------------


def test_winnow_guarantee_shared_run_detected(spark):
    # The winnowing guarantee: any shared run of >= w+k-1 = 6 words
    # leaves at least one common selected fingerprint.
    from automotive_translation_pipeline_spark.operators.dedup import (
        winnow_fingerprint_pairs,
    )

    run = "s1 s2 s3 s4 s5 s6"
    df = _docs(
        spark,
        [
            (1, "p1 p2 p3 " + run + " q1 q2"),
            (2, "z1 z2 " + run + " y1 y2 y3"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        ],
    )
    out = winnow_fingerprint_pairs(
        df, k=3, w=4, min_shared=1, max_df=50
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_selects_subset_of_grams(spark):
    # Window-min selection keeps far fewer fingerprints than grams
    # exist; identical docs still match on the full selected set.
    from automotive_translation_pipeline_spark.operators.dedup import (
        winnow_fingerprint_pairs,
    )

    text = " ".join(f"t{i}" for i in range(40))
    df = _docs(spark, [(1, text), (2, text)])
    out = winnow_fingerprint_pairs(
        df, k=3, w=4, min_shared=1, max_df=50
    ).collect()
    assert len(out) == 1
    (r,) = out
    # 38 grams exist; winnowing keeps roughly 2/(w+1) of them.
    assert 2 <= r.shared_fps < 20


def test_winnow_frequency_cap_drops_boilerplate(spark):
    # A gram present in every doc exceeds max_df and cannot pair.
    from automotive_translation_pipeline_spark.operators.dedup import (
        winnow_fingerprint_pairs,
    )

    boiler = "same same same"
    df = _docs(
        spark,
        [(i, f"u{i}a u{i}b {boiler} u{i}c" ) for i in range(1, 6)],
    )
    out = winnow_fingerprint_pairs(
        df, k=3, w=4, min_shared=1, max_df=2
    ).collect()
    assert out == []


# --- LSH stop-bucket cap ----------------------------------------------------


def test_lsh_stop_bucket_cap_drops_overfull_buckets(spark):
    # Five identical docs: every band bucket holds all 5. With
    # max_bucket=4 every bucket is over-cap, so NO candidate pairs
    # survive; with the cap off, all C(5,2)=10 pairs emerge.
    from automotive_translation_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    text = "a b c d e f g h i j"
    df = _docs(spark, [(i, text) for i in range(1, 6)])
    capped = minhash_lsh_candidates(df, max_bucket=4).collect()
    assert capped == []
    uncapped = minhash_lsh_candidates(df, max_bucket=None).collect()
    assert len(uncapped) == 10


def test_lsh_cap_keeps_pairs_with_an_undercap_band(spark):
    # Two exact duplicates among otherwise-distinct docs: their
    # buckets hold only the pair, far under any reasonable cap.
    from automotive_translation_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    dup = "x1 x2 x3 x4 x5 x6 x7 x8"
    rows = [(1, dup), (2, dup)] + [
        (i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(3, 8)
    ]
    out = minhash_lsh_candidates(_docs(spark, rows), max_bucket=2).collect()
    assert {(r.id_a, r.id_b) for r in out} >= {(1, 2)}


# --- PCA --------------------------------------------------------------------


def test_pca_components_orthonormal_and_monotone(spark):
    import numpy as np

    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_fit,
        pca_reconstruction_report,
    )
    from automotive_translation_pipeline_spark.sources import load_testdata

    emb = load_testdata(spark, "/root/testdata/sf0.001")["embeddings"]
    mean, comps, expl = pca_fit(emb, k=16)
    assert comps.shape == (16, 64)
    assert np.allclose(comps @ comps.T, np.eye(16), atol=1e-8)
    assert 0.0 < float(expl.sum()) <= 1.0 + 1e-9

    def mse(k):
        rows = pca_reconstruction_report(emb, k=k).collect()
        n = sum(r.n_vecs for r in rows)
        return sum(r.mean_recon_mse * r.n_vecs for r in rows) / n

    m8, m32, m64 = mse(8), mse(32), mse(64)
    assert m32 < m8            # more components, less error
    assert m64 < 1e-9          # full rank reconstructs exactly


def test_pca_scatter_matches_numpy(spark):
    # The distributed GEMM-partial scatter must equal the plain numpy
    # covariance computed on the collected corpus.
    import numpy as np

    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_fit,
    )
    from automotive_translation_pipeline_spark.sources import load_testdata

    emb = load_testdata(spark, "/root/testdata/sf0.001")["embeddings"]
    mean, comps, expl = pca_fit(emb, k=64)
    x = np.stack([r.embedding for r in emb.collect()]).astype("float64")
    assert np.allclose(mean, x.mean(axis=0), atol=1e-10)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = evals.sum()
    assert np.allclose(expl, evals / total, atol=1e-8)


# --- span-family invariants on randomized corpora ---------------------------


import pytest


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_span_detect_remove_invariants(spark, seed):
    """On any corpus: (1) removal conserves words (kept + removed ==
    total), (2) a doc can only lose words if the detector found
    duplicated text in it, (3) detector spans are bounded by the doc."""
    import random

    from automotive_translation_pipeline_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> real dups
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(1, 26)
    ]
    df = _docs(spark, rows)
    det = {r.doc_id: r for r in duplicate_spans(df, k=4).collect()}
    rem = {r.doc_id: r for r in remove_duplicate_spans(df, k=4).collect()}
    assert set(rem) == {i for i, _ in rows}  # removal covers every doc
    for i, text in rows:
        r = rem[i]
        assert r.kept_words + r.removed_words == r.n_words
        assert r.kept_words >= 0 and r.removed_words >= 0
        if r.removed_words > 0:
            assert i in det  # only detected docs lose text
    for i, d in det.items():
        assert 1 <= d.n_spans
        assert d.max_span <= d.dup_words <= d.n_words
        assert d.n_words >= 4
