"""Round-7 hardening: the four ADVICE fixes (empty-input PCA error,
non-int group_col in the reconstruction report, semantic_dedup's
actual-sample clamp) plus regression coverage for this round's new
catalog entries."""

import pytest
from pyspark.sql import functions as F

from automotive_translation_pipeline_spark.sources import load_testdata

SF = "/root/testdata/sf0.001"


def test_pca_fit_empty_input_raises_clear_error(spark):
    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_fit,
    )

    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="no non-null"):
        pca_fit(empty)


def test_pca_recon_report_string_group_col(spark):
    # The mapInPandas schema derives the group field's type from the
    # input — a string group key must work, not Arrow-cast-fail.
    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_reconstruction_report,
    )

    emb = load_testdata(spark, SF)["embeddings"].withColumn(
        "bucket", F.concat(F.lit("g"), (F.col("label") % 3).cast("string"))
    )
    rows = pca_reconstruction_report(emb, group_col="bucket", k=8).collect()
    assert {r.bucket for r in rows} == {"g0", "g1", "g2"}
    assert all(r.mean_recon_mse >= 0.0 for r in rows)


def test_pca_recon_report_int64_group_col(spark):
    from automotive_translation_pipeline_spark.operators.embeddings import (
        pca_reconstruction_report,
    )

    emb = load_testdata(spark, SF)["embeddings"].withColumn(
        "gid", (F.col("vec_id") % 2).cast("long")
    )
    rows = pca_reconstruction_report(emb, group_col="gid", k=8).collect()
    assert {r.gid for r in rows} == {0, 1}


def test_semantic_dedup_tiny_corpus_clamps_cells(spark):
    # n_cells is clamped against the ACTUAL fit rows: a 6-vector
    # corpus with a requested 64 cells must fit, not throw k > rows.
    from automotive_translation_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = load_testdata(spark, SF)["embeddings"].filter(F.col("vec_id") < 6)
    out = semantic_dedup(emb, n_cells=64, threshold=0.999)
    assert out.count() <= 6


# --- curation_full_pipeline (round-7 flagship) ------------------------------


def test_remove_duplicate_spans_text_matches_report_form(spark):
    # The text form and the report form ride the same internal plan:
    # token counts must agree doc-for-doc, and md5(clean_text) must
    # equal the report's kept_md5 (the value contract).
    from pyspark.sql import functions as F

    from automotive_translation_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
        remove_duplicate_spans_text,
    )

    docs = load_testdata(spark, SF)["documents"]
    report = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, k=8).collect()
    }
    texted = remove_duplicate_spans_text(docs, k=8).select(
        "doc_id", "lang", "kept_words",
        F.md5(F.col("clean_text").cast("binary")).alias("m"),
    ).collect()
    assert len(texted) == len(report)
    for r in texted:
        assert r["kept_words"] == report[r["doc_id"]]["kept_words"]
        assert r["m"] == report[r["doc_id"]]["kept_md5"]
        assert r["lang"] is not None  # carry columns survive


def test_curation_full_pipeline_plan_contract(spark, sf_dir):
    """The flagship chain's physical plan only ever SHUFFLES narrow
    keys — fingerprints, ids, buckets, shard/source labels — never
    text; the one sort-merge join is the doc-scaled packed-vs-DSIR
    rejoin (both sides corpus-sized, so SMJ is the correct choice);
    every dimension-sized side broadcasts; the only nested-loop joins
    are broadcast one-row totals."""
    import re

    from automotive_translation_pipeline_spark import queries_catalog as qc

    df = qc.queries()["curation_full_pipeline"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    norm = re.sub(r"#\d+L?", "", plan)
    shuffle_keys = set(
        re.findall(r"Exchange hashpartitioning\(([^,)]+)", norm)
    )
    # (__bkt left this set in round 8: DSIR's bucket-stats pass runs
    # eagerly at checkpoint time, so its bucket-sized exchange no
    # longer appears in the flagship plan.)
    assert shuffle_keys == {
        "__fp", "__s", "doc_id", "lang", "source"
    }, shuffle_keys
    smj_keys = set(re.findall(r"SortMergeJoin \[(\w+)", norm))
    assert smj_keys <= {"doc_id"}, smj_keys
    assert "BroadcastHashJoin" in norm
    assert "CartesianProduct" not in norm
    # nested-loop appearances must all be broadcast cross joins of
    # one-row aggregates (the rates/totals tables)
    for line in norm.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight, Cross" in line, line


def test_minhash_lsh_probe_matches_self_join_cross_pairs(spark):
    """Probe pairs (new x index) == the full self-join's pairs
    restricted to cross-side ones — the incremental path loses
    nothing the batch-vs-corpus contract promises."""
    from automotive_translation_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_probe,
    )

    docs = load_testdata(spark, SF)["documents"]
    is_new = F.col("doc_id") % 7 == 0
    probe = minhash_lsh_probe(
        docs.filter(~is_new), docs.filter(is_new), num_hashes=8, bands=4
    )
    got = {(r.new_id, r.index_id) for r in probe.collect()}
    full = minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    want = {
        (a, b) if a % 7 == 0 else (b, a)
        for a, b in ((r.id_a, r.id_b) for r in full.collect())
        if (a % 7 == 0) != (b % 7 == 0)
    }
    assert got == want
    assert len(want) > 0  # non-vacuous: planted dups cross the split


def test_minhash_lsh_probe_accepts_prebuilt_index(spark):
    """Passing the persisted (id, band, bucket) banded table as the
    index side short-circuits corpus re-hashing and yields identical
    pairs — the write-once / probe-forever index contract."""
    from automotive_translation_pipeline_spark.operators.dedup import (
        lsh_banded_table,
        minhash_lsh_probe,
    )

    docs = load_testdata(spark, SF)["documents"]
    is_new = F.col("doc_id") % 7 == 0
    idx_docs, new_docs = docs.filter(~is_new), docs.filter(is_new)
    prebuilt = lsh_banded_table(idx_docs, num_hashes=8, bands=4)
    via_prebuilt = {
        (r.new_id, r.index_id)
        for r in minhash_lsh_probe(prebuilt, new_docs,
                                   num_hashes=8, bands=4).collect()
    }
    via_raw = {
        (r.new_id, r.index_id)
        for r in minhash_lsh_probe(idx_docs, new_docs,
                                   num_hashes=8, bands=4).collect()
    }
    assert via_prebuilt == via_raw


def test_minhash_lsh_probe_broadcasts_batch_side(spark):
    """The increment side broadcasts: the corpus-side banded table is
    probed without a shuffle (no Exchange feeding the join's index
    side beyond the banding's own groupBy)."""
    from automotive_translation_pipeline_spark.operators.dedup import (
        minhash_lsh_probe,
    )

    docs = load_testdata(spark, SF)["documents"]
    is_new = F.col("doc_id") % 7 == 0
    plan = (
        minhash_lsh_probe(docs.filter(~is_new), docs.filter(is_new))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_perplexity_buckets_tercile_contract(spark):
    """Per-lang bucket sizes differ by at most 1 doc (exact integer
    terciles) and head mean surprisal <= tail mean surprisal."""
    from automotive_translation_pipeline_spark import queries_catalog as qc

    rows = qc.queries()["text_perplexity_buckets"](spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.ppl_bucket] = r
    for lang, buckets in by_lang.items():
        sizes = [b.n_docs for b in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if {"head", "tail"} <= buckets.keys():
            head = buckets["head"]
            tail = buckets["tail"]
            assert (head.surprisal_e4 / head.n_docs
                    <= tail.surprisal_e4 / tail.n_docs), lang


def test_gopher_repetition_ngrams_closed_form(spark, tmp_path):
    """'a b a b': the 2-gram 'a b' repeats (2 of 3 instances, 6 of 9
    chars -> 6667e-4); all 3- and 4-grams are unique -> 0. A 3-word doc
    emits no 4-gram row."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from automotive_translation_pipeline_spark import queries_catalog as qc

    d = str(tmp_path)
    for f in __import__("os").listdir(SF):  # load_testdata opens every table
        shutil.copy(f"{SF}/{f}", f"{d}/{f}")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["a b a b", "x y z"],
        "lang": ["en", "en"],
        "source": ["s", "s"],
        "n_chars": pa.array([7, 5], pa.int64()),
    }), f"{d}/documents.parquet")
    rows = {
        (r.doc_id, r.n): r
        for r in qc.queries()["text_gopher_repetition_ngrams"](
            spark, d
        ).collect()
    }
    assert rows[(1, 2)].dup_char_frac_e4 == 6667  # 6/9 chars duplicated
    assert rows[(1, 2)].n_grams == 3
    assert rows[(1, 3)].dup_char_frac_e4 == 0
    assert rows[(1, 4)].dup_char_frac_e4 == 0
    assert rows[(2, 2)].dup_char_frac_e4 == 0
    assert (2, 4) not in rows  # 3 words: no 4-grams, no phantom row


def test_remove_spans_string_id_fallback_matches_integral_path(spark):
    # The canonical-first election has two physical forms: a packed
    # BIGINT HashAggregate for integral ids and a min(struct) fallback
    # for everything else. Same semantics — lowest (id, position)
    # first occurrence — so renaming ids 1..n to "d01".."d0n"
    # (order-preserving) must cut the exact same words.
    from automotive_translation_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        (1, shared + " a1 a2 a3 a4 a5 a6 a7 a8"),
        (2, "b1 b2 b3 b4 b5 b6 b7 b8 " + shared),
        (3, shared),
    ]
    ints = spark.createDataFrame(rows, "doc_id bigint, text string")
    strs = spark.createDataFrame(
        [(f"d{i:02d}", t) for i, t in rows], "doc_id string, text string"
    )
    got_int = {
        r.doc_id: (r.kept_words, r.removed_words, r.kept_md5)
        for r in remove_duplicate_spans(ints, k=8).collect()
    }
    got_str = {
        r.doc_id: (r.kept_words, r.removed_words, r.kept_md5)
        for r in remove_duplicate_spans(strs, k=8).collect()
    }
    assert got_str == {f"d{i:02d}": got_int[i] for i in got_int}
    assert got_int[1][1] == 0 and got_int[2][1] == 8 and got_int[3][1] == 8


def test_remove_spans_packed_key_guard_raises_on_huge_id(spark):
    # Ids at or beyond 2^42 would overflow the packed (id, pos) key;
    # the in-plan guard must raise, never silently mis-elect.
    import pytest

    from automotive_translation_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    text = "g1 g2 g3 g4 g5 g6 g7 g8"
    df = spark.createDataFrame(
        [(1 << 42, text), ((1 << 42) + 1, text)],
        "doc_id bigint, text string",
    )
    # match pins the guard's own message so an unrelated failure (a
    # typo'd column, an AnalysisException) cannot green this test.
    with pytest.raises(Exception, match="packed canonical key"):
        remove_duplicate_spans(df, k=8).collect()

    # packed_ids=False is the documented escape hatch for id domains
    # the packing cannot hold: same election via min(struct), no raise.
    rows = remove_duplicate_spans(df, k=8, packed_ids=False).collect()
    got = {r.doc_id: (r.kept_words, r.removed_words) for r in rows}
    assert got == {1 << 42: (8, 0), (1 << 42) + 1: (0, 8)}
