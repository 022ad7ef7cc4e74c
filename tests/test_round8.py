"""Round-8 hardening: the ADVICE fixes (null-id contract for
remove_duplicate_segments, packed-id escape hatch, wc branch off the
repartitioned plan) plus the LSH stop-bucket cap rewrite (hash
aggregate + anti-join, never a count-over-window on the banded
stream)."""

from pyspark.sql import functions as F

from automotive_translation_pipeline_spark.sources import load_testdata

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_cap_is_aggregate_anti_join_not_window(spark):
    """The max_bucket cap must never plan a WindowExec over the banded
    stream (count-over-window = whole-stream sort; the shape the span
    family purged). It should be a grouped count + LEFT ANTI."""
    from automotive_translation_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_probe,
    )

    docs = load_testdata(spark, SF)["documents"]
    cand = minhash_lsh_candidates(docs, max_bucket=10)
    plan = _plan(cand)
    assert "Window" not in plan, plan
    assert "LeftAnti" in plan, plan

    idx = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(20)
    probe = minhash_lsh_probe(idx, batch, max_bucket=10)
    plan = _plan(probe)
    assert "Window" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_lsh_cap_semantics_unchanged(spark):
    """The anti-join cap keeps exactly the pairs the window form kept:
    a pair survives iff SOME band bucket holding both is at-or-under
    cap. Cross-check against a recomputed window-style reference."""
    from pyspark.sql import Window

    from automotive_translation_pipeline_spark.operators.dedup import (
        lsh_banded_table,
        minhash_lsh_candidates,
    )

    docs = load_testdata(spark, SF)["documents"]
    cap = 5
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, max_bucket=cap).collect()
    }
    banded = lsh_banded_table(docs, "text", "doc_id")
    occ = Window.partitionBy("band", "bucket")
    capped = (
        banded.withColumn("__occ", F.count(F.lit(1)).over(occ))
        .filter(F.col("__occ") <= cap)
        .drop("__occ")
    )
    ref = {
        (r.id_a, r.id_b)
        for r in capped.alias("l")
        .join(
            capped.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
        .collect()
    }
    assert got == ref and got  # non-vacuous: some pairs survive


def test_remove_segments_null_ids_pass_through(spark):
    """NULL-id docs pass through whole: one output row each (not one
    merged groupBy(null) row), all blocks kept — and their blocks do
    not elect first occurrences that cut text from real docs."""
    from automotive_translation_pipeline_spark.operators.chunking import (
        remove_duplicate_segments,
    )

    blk = "w1 w2 w3 w4"  # seg_words=4 -> one block per phrase
    rows = [
        (None, f"{blk} only in null docs"),
        (None, f"{blk} other null doc"),
        (10, f"{blk} real doc copy a"),
        (11, f"{blk} real doc copy a"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = remove_duplicate_segments(df, seg_words=4).collect()
    assert len(out) == 4  # every input doc, null ids NOT merged
    nulls = [r for r in out if r.doc_id is None]
    assert len(nulls) == 2
    # pass-through: every block kept, text intact
    assert all(r.n_kept == r.n_segments for r in nulls)
    assert {r.kept_text for r in nulls} == {
        f"{blk} only in null docs",
        f"{blk} other null doc",
    }
    # real docs still dedup among themselves: doc 11 loses both blocks
    # (the shared `blk` block AND its exact-duplicate tail) to doc 10.
    by_id = {r.doc_id: r for r in out if r.doc_id is not None}
    assert by_id[10].n_kept == 2
    assert by_id[11].n_kept == 0
    # the null docs' `blk` occurrences did not cut doc 10's copy
    assert by_id[10].kept_text == f"{blk} real doc copy a"


def test_remove_segments_packed_ids_escape_hatch(spark):
    """Snowflake-scale integral ids work via packed_ids=False (the
    min(struct) election) and produce the same dedup decisions."""
    from automotive_translation_pipeline_spark.operators.chunking import (
        remove_duplicate_segments,
    )

    big = 1 << 42
    df = spark.createDataFrame(
        [(big, "a b c d"), (big + 1, "a b c d")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r.n_kept
        for r in remove_duplicate_segments(
            df, seg_words=4, packed_ids=False
        ).collect()
    }
    assert out == {big: 1, big + 1: 0}


def test_unigram_wc_branch_has_no_repartition(spark):
    """The corpus word-count branch must come from the raw scan, not
    the repartition(id) plan (AQE does not dedupe a shared
    repartition) — since round 9 the wc aggregate runs eagerly at
    checkpoint time off the raw scan, so the visible plan shows it as
    Scan ExistingRDD. Under the vocabulary broadcast gate the per-doc
    side pays exactly ONE exchange end-to-end: the explicit
    repartition(id); groupBy(word,id), the broadcast wc probe, and the
    final groupBy(id) all reuse that partitioning."""
    from automotive_translation_pipeline_spark.operators.lm import (
        unigram_surprisal,
    )

    import re

    docs = load_testdata(spark, SF)["documents"]
    plan = _plan(unigram_surprisal(docs))
    # DISTINCT repartition exchanges (the plan string re-prints cached
    # subtrees, so the same exchange can appear twice; plan_id
    # disambiguates) — the wc branch must not add a second one.
    repart_ids = {
        m.group(1)
        for m in re.finditer(
            r"REPARTITION_BY\w*, \[plan_id=(\d+)\]", plan
        )
    }
    assert len(repart_ids) <= 1, plan
    # checkpointed wc branch: visible as an RDD scan, not a re-scan
    assert "Scan ExistingRDD" in plan, plan
    # the wc probe is a broadcast join at test vocabulary sizes
    assert "BroadcastHashJoin" in plan, plan
    # and the ONLY hash exchange anywhere is the explicit repartition:
    # every Exchange hashpartitioning line must be the REPARTITION one
    # (no pairs-by-word exchange, no doc-rollup exchange).
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "REPARTITION_BY" in m.group(0), m.group(0)


def test_unigram_fallback_keeps_shuffle_hash(spark):
    """Above the vocabulary gate the wc probe must fall back to the
    shuffle-hash join and produce identical values."""
    from automotive_translation_pipeline_spark.operators.lm import (
        unigram_surprisal,
    )

    rows = [(1, "a a b"), (2, "b c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    wide = unigram_surprisal(df, broadcast_max_vocab=0)
    plan = _plan(wide)
    assert "ShuffledHashJoin" in plan, plan
    got_wide = {r.doc_id: (r.n_words, r.avg_surprisal)
                for r in wide.collect()}
    got_bcast = {
        r.doc_id: (r.n_words, r.avg_surprisal)
        for r in unigram_surprisal(df, broadcast_max_vocab=10**9).collect()
    }
    assert got_wide == got_bcast and got_wide[1][0] == 3


def test_bigram_surprisal_values_match_definition(spark):
    """The md5-key / derived-c1 / pre-attached-lnp rewrite is
    plan-only: values must match -mean(ln(c12/c1)) computed by hand."""
    import math

    from automotive_translation_pipeline_spark.operators.lm import (
        bigram_surprisal,
    )

    rows = [(1, "a b a b"), (2, "b a"), (3, "x")]  # doc 3: no bigrams
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_surprisal)
        for r in bigram_surprisal(df).collect()
    }
    # bigrams: d1: (a,b)x2 (b,a)x1; d2: (b,a)x1
    # c12: (a,b)=2, (b,a)=2 ; c1: a=2, b=2
    exp1 = -(2 * math.log(2 / 2) + math.log(2 / 2)) / 3
    exp2 = -math.log(2 / 2)
    assert 3 not in got
    assert got[1] == (3, round(exp1, 4))
    assert got[2] == (1, round(exp2, 4))


def test_bigram_surprisal_stream_joins_once_on_fp(spark):
    """Plan contract for the sf100 fix: TWO corpus passes (the c12
    aggregate runs eagerly at checkpoint time; the visible plan has
    only the stream's Generate), and under the vocabulary-size gate
    the corpus-sized stream NEVER exchanges before the per-doc
    rollup: the ln-p table (keyed by the primitive xxhash64
    fingerprint, never the Zipf-hot head word) is broadcast into the
    stream join, so the only hash exchange on the doc-id stream is
    the final rollup."""
    from automotive_translation_pipeline_spark.operators.lm import (
        bigram_surprisal,
    )

    docs = load_testdata(spark, SF)["documents"]
    plan = _plan(bigram_surprisal(docs))
    assert plan.count("Generate") == 1, plan  # stream only; c12 checkpointed
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan
    assert plan.count("BroadcastHashJoin") == 1, plan  # stream⋈lnp
    assert plan.count("ShuffledHashJoin") == 1, plan  # c12⋈c1 (vocab-sized)
    # The doc-id stream pays exactly ONE exchange: the final per-doc
    # rollup — no fp-join exchange, no (doc, fp) pre-collapse.
    assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
    assert "Exchange hashpartitioning(__fp" not in plan, plan


def test_bigram_surprisal_fallback_keeps_fp_shuffle_hash(spark):
    """Above the vocabulary gate (a true 100 TB vocabulary) the
    stream⋈lnp join must fall back to the fingerprint-keyed
    shuffle-hash join — uniform by construction — and produce the
    exact same values as the broadcast path."""
    from automotive_translation_pipeline_spark.operators.lm import (
        bigram_surprisal,
    )

    rows = [(1, "a b a b c"), (2, "b a"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    wide = bigram_surprisal(df, broadcast_max_vocab=0)
    plan = _plan(wide)
    assert plan.count("ShuffledHashJoin") == 2, plan  # c12⋈c1, stream⋈lnp
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan
    got_wide = {r.doc_id: (r.n_bigrams, r.avg_surprisal)
                for r in wide.collect()}
    got_bcast = {
        r.doc_id: (r.n_bigrams, r.avg_surprisal)
        for r in bigram_surprisal(df, broadcast_max_vocab=10**9).collect()
    }
    assert got_wide == got_bcast and 1 in got_wide and 3 not in got_wide


def test_dsir_values_match_definition(spark):
    """The no-persist two-pass DSIR rewrite is plan-only: weights
    must match the smoothed bucket log-ratio computed directly."""
    import math

    from automotive_translation_pipeline_spark.operators.sampling import (
        dsir_importance_weights,
        hash_bucket,
    )
    from pyspark.sql import functions as F

    rows = [(1, "good text", True), (2, "bad stuff", False)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    n_b = 8
    got = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_importance_weights(
            df, F.col("tgt"), n_buckets=n_b
        ).collect()
    }
    # replicate: features = unigrams + bigrams per doc
    feats = {1: ["good", "text", "good text"], 2: ["bad", "stuff", "bad stuff"]}
    bkt_rows = df.select(
        hash_bucket(F.lit("good"), n_b).alias("b1"),
        hash_bucket(F.lit("text"), n_b).alias("b2"),
        hash_bucket(F.lit("good text"), n_b).alias("b3"),
        hash_bucket(F.lit("bad"), n_b).alias("b4"),
        hash_bucket(F.lit("stuff"), n_b).alias("b5"),
        hash_bucket(F.lit("bad stuff"), n_b).alias("b6"),
    ).first()
    fb = {
        "good": bkt_rows.b1, "text": bkt_rows.b2, "good text": bkt_rows.b3,
        "bad": bkt_rows.b4, "stuff": bkt_rows.b5, "bad stuff": bkt_rows.b6,
    }
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for d, fs in feats.items():
        for f_ in fs:
            raw[fb[f_]] = raw.get(fb[f_], 0) + 1
            if d == 1:
                tgt[fb[f_]] = tgt.get(fb[f_], 0) + 1
    t_raw, t_tgt = 6, 3
    for d, fs in feats.items():
        lw = sum(
            math.log((tgt.get(fb[f_], 0) + 1) / (t_tgt + n_b))
            - math.log((raw[fb[f_]] + 1) / (t_raw + n_b))
            for f_ in fs
        )
        assert got[d][0] == 3
        assert abs(got[d][1] - lw) < 1e-3, (d, got[d], lw)


def test_unigram_surprisal_values_unchanged(spark):
    """The wc-branch rewrite is plan-only: values must match the
    definition -mean(ln(wc/total)) computed directly."""
    import math

    from automotive_translation_pipeline_spark.operators.lm import (
        unigram_surprisal,
    )

    rows = [(1, "a a b"), (2, "b c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_words, r.avg_surprisal)
        for r in unigram_surprisal(df).collect()
    }
    # corpus: a=2, b=2, c=1, total=5
    exp1 = -(2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = -(math.log(2 / 5) + math.log(1 / 5)) / 2
    assert got[1][0] == 3 and abs(got[1][1] - exp1) < 1e-3
    assert got[2][0] == 2 and abs(got[2][1] - exp2) < 1e-3
