"""Unit tests for the round-4 additions: BM25 search, char entropy,
sorted-neighborhood dedup, cohort retention, CDC apply, equi-depth
histogram, bloom-pruned semi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from automotive_translation_pipeline_spark.functions.text import char_entropy
from automotive_translation_pipeline_spark.operators.aggregates import (
    equidepth_histogram,
)
from automotive_translation_pipeline_spark.operators.cdc import apply_changes
from automotive_translation_pipeline_spark.operators.dedup import (
    sorted_neighbor_pairs,
)
from automotive_translation_pipeline_spark.operators.joins import bloom_semi_join
from automotive_translation_pipeline_spark.operators.search import (
    bm25_topk,
    build_postings,
)
from automotive_translation_pipeline_spark.operators.windows import (
    cohort_retention,
)


def test_bm25_ranks_exact_match_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark engine fast"),
            (2, "spark spark spark engine engine"),
            (3, "slow table scan"),
            (4, "engine"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(spark, docs, [(1, "spark engine")], k=4).collect()
    got = {r.doc_id: r.score for r in out}
    # doc 3 shares no term -> absent entirely
    assert 3 not in got and len(got) == 3
    # both-term docs beat the single-term doc
    assert got[1] > got[4] and got[2] > got[4]


def test_bm25_postings_tf(spark):
    docs = spark.createDataFrame([(1, "a b a"), (2, "b")], ["doc_id", "text"])
    rows = {
        (r.word, r.doc_id): r.tf for r in build_postings(docs).collect()
    }
    assert rows == {("a", 1): 2, ("b", 1): 1, ("b", 2): 1}


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("abca",), ("",)], ["t"]
    ).select(char_entropy(F.col("t")).alias("h"))
    vals = [r.h for r in df.collect()]
    assert vals[0] == 0.0
    assert abs(vals[1] - 1.5) < 1e-9  # p = {a: .5, b: .25, c: .25}
    assert vals[2] == 0.0


def test_char_entropy_uniform_alphabet(spark):
    df = spark.createDataFrame([("abcdefgh",)], ["t"]).select(
        char_entropy(F.col("t")).alias("h")
    )
    assert abs(df.collect()[0].h - 3.0) < 1e-9  # 8 equiprobable chars


def test_sorted_neighbors_finds_edited_tail(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),  # same prefix, edited tail
            (3, "omega psi chi"),
        ],
        ["doc_id", "text"],
    )
    pairs = sorted_neighbor_pairs(docs, threshold=0.5).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert abs(pairs[0].jaccard - 4 / 6) < 1e-3


def test_sorted_neighbors_respects_blocks(spark):
    # identical texts in different blocks are never compared
    docs = spark.createDataFrame(
        [(1, "aa same words here"), (2, "bb same words here")],
        ["doc_id", "text"],
    )
    assert sorted_neighbor_pairs(docs, threshold=0.1).count() == 0


def test_cohort_retention_triangle(spark):
    rows = [
        # user 1: first Jan-1 (cohort Mon Jan-1), active wk0 and wk1
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        # user 2: same cohort, wk0 only
        (2, "2024-01-02 10:00:00"),
        # user 3: cohort Jan-8, wk0 only
        (3, "2024-01-08 10:00:00"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "s"]).select(
        "user_id", F.to_timestamp("s").alias("ts")
    )
    out = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in cohort_retention(events).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_apply_changes_tombstone_and_out_of_order(spark):
    feed = spark.createDataFrame(
        [
            # key 1: insert then update (out of order in the feed)
            (1, 2, "U", 20.0),
            (1, 1, "I", 10.0),
            # key 2: update then delete -> gone
            (2, 1, "U", 5.0),
            (2, 2, "D", 0.0),
            # key 3: delete then LATER re-insert -> present
            (3, 1, "D", 0.0),
            (3, 2, "I", 7.0),
        ],
        ["k", "seq", "op", "v"],
    )
    snap = {
        r.k: r.v
        for r in apply_changes(feed, ["k"], ["seq"]).collect()
    }
    assert snap == {1: 20.0, 3: 7.0}


def test_equidepth_histogram_exact_bins(spark):
    df = spark.createDataFrame(
        [(float(i), i) for i in range(100)], ["v", "id"]
    )
    out = {r.bin: r for r in equidepth_histogram(df, "v", ["id"], bins=10).collect()}
    assert len(out) == 10
    for b in range(10):
        assert out[b].n_rows == 10
        assert out[b].lo == 10.0 * b
        assert out[b].hi == 10.0 * b + 9.0


def test_bloom_semi_join_matches_exact(spark):
    big = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    small = spark.createDataFrame([(i * 7,) for i in range(50)], ["k"])
    got = sorted(r.k for r in bloom_semi_join(big, small, "k").collect())
    expect = sorted(
        r.k
        for r in big.join(small.distinct(), "k", "left_semi").collect()
    )
    assert got == expect


def test_grouped_ols_perfect_line(spark):
    from automotive_translation_pipeline_spark.operators.stats import grouped_ols

    df = spark.createDataFrame(
        [("g", float(x), 2.0 * x + 1.0) for x in range(10)], ["g", "x", "y"]
    )
    r = grouped_ols(df, ["g"], "y", "x").collect()[0]
    assert (r.slope, r.intercept, r.r2, r.n) == (2.0, 1.0, 1.0, 10)


def test_mad_outliers_flags_spike(spark):
    from automotive_translation_pipeline_spark.operators.stats import mad_outliers

    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {r.v: r.is_outlier for r in mad_outliers(df, ["g"], "v").collect()}
    assert out[1000.0] is True
    assert out[10.0] is False


def test_mad_constant_group_yields_null(spark):
    from automotive_translation_pipeline_spark.operators.stats import mad_outliers

    df = spark.createDataFrame([("g", 5.0)] * 4, ["g", "v"])
    rows = mad_outliers(df, ["g"], "v").collect()
    assert all(r.robust_z is None and r.is_outlier is None for r in rows)


def test_cooccurrence_bounded_pairs(spark):
    from automotive_translation_pipeline_spark.operators.aggregates import (
        cooccurrence_pairs,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"), (3, "a")],
        ["basket", "item"],
    )
    out = {
        (r.item_a, r.item_b): r.n_baskets
        for r in cooccurrence_pairs(df, ["basket"], "item").collect()
    }
    assert out == {("a", "b"): 2}


def test_pagerank_star_center_dominates(spark):
    from automotive_translation_pipeline_spark.operators.graph import pagerank

    # star: 0 -- {1,2,3}, symmetrized
    und = [(0, i) for i in (1, 2, 3)]
    edges = spark.createDataFrame(
        und + [(v, u) for u, v in und], ["u", "v"]
    )
    pr = {r.node: r.pr_rel for r in pagerank(edges, iterations=5).collect()}
    assert pr[0] > pr[1] == pr[2] == pr[3]
    assert abs(sum(pr.values()) - 4.0) < 1e-2  # mass conserved (x N)


def test_triangle_counts_exact(spark):
    from automotive_translation_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # triangle 1-2-3 plus a chain 3-4-5 (no triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    out = {r.node: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_int8_quantize_roundtrip_and_zero_vector(spark):
    from automotive_translation_pipeline_spark.operators.embeddings import (
        int8_quantize,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r.vec_id: r for r in int8_quantize(df).collect()}
    r1 = out[1]
    assert abs(r1.scale - 1.0 / 127) < 1e-6  # operator rounds to 6 digits
    assert r1.q == [127, -64, 32, 0]  # round(-63.5) away from zero
    assert r1.mse < (r1.scale / 2) ** 2  # error bounded by half a step
    r2 = out[2]
    assert r2.scale is None and r2.q is None and r2.mse is None


def test_bigram_surprisal_detects_shuffled_order(spark):
    from automotive_translation_pipeline_spark.operators.lm import (
        bigram_surprisal,
    )

    # corpus dominated by "a b"/"b a" transitions; doc 3's "b b" is a
    # corpus-rare transition and must score strictly higher
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b"), (3, "b b"), (4, "x")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    assert 4 not in rows  # single word: no bigrams
    assert rows[3].avg_surprisal > rows[1].avg_surprisal
    assert rows[1].n_bigrams == 5


def test_markov_transitions_probabilities(spark):
    from automotive_translation_pipeline_spark.operators.windows import (
        markov_transitions,
    )

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (1, 2, "2024-01-01 00:01:00", "view"),
        (1, 3, "2024-01-01 00:02:00", "purchase"),
        (2, 4, "2024-01-01 00:00:00", "view"),
        (2, 5, "2024-01-01 00:01:00", "error"),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_id", "s", "event_type"]
    ).select("user_id", "event_id", F.to_timestamp("s").alias("ts"),
             "event_type")
    out = {
        (r.state, r.next_state): (r.n_pairs, r.p)
        for r in markov_transitions(ev).collect()
    }
    # from 'view': view->view 1, view->purchase 1, view->error 1
    assert out[("view", "view")] == (1, round(1 / 3, 4))
    assert out[("view", "purchase")] == (1, round(1 / 3, 4))
    assert out[("view", "error")] == (1, round(1 / 3, 4))
    # no pair starts at a sequence end
    assert ("purchase", "view") not in out


def test_rrf_fuse_rewards_agreement(spark):
    from automotive_translation_pipeline_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["query_id", "doc_id", "rank"]
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (1, 99, 3)], ["query_id", "doc_id", "rank"]
    )
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k=60).collect()}
    # docs 10 and 11 appear top-2 in both systems; 12/99 in one each
    assert out[10].fused_rank <= 2 and out[11].fused_rank <= 2
    assert out[12].fused_rank > 2 and out[99].fused_rank > 2
    assert abs(out[10].rrf_score - (1 / 61 + 1 / 62)) < 1e-6


def test_prefix_jaccard_matches_bruteforce(spark):
    from automotive_translation_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "lorem ipsum dolor sit amet"),
            (4, "lorem ipsum dolor sit there"),
            (5, "completely different content entirely"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=0.6, shingle_k=None
        ).collect()
    }
    # brute-force ground truth at t=0.6
    import itertools

    texts = {r.doc_id: set(r.text.split()) for r in docs.collect()}
    expect = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        j = len(texts[a] & texts[b]) / len(texts[a] | texts[b])
        if round(j, 4) >= 0.6:
            expect[(a, b)] = round(j, 4)
    assert got == expect and len(got) >= 2


def test_prefix_jaccard_shingle_mode(spark):
    from automotive_translation_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "one two three four five seven"),  # shares 3 of 5 shingles... 
            (3, "totally unrelated words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=0.5, shingle_k=3
        ).collect()
    }
    # docs 1/2: shingle sets of size 4 each, 3 shared -> J = 3/5 = 0.6
    assert out == {(1, 2): 0.6}


def test_time_weighted_avg_holding_intervals(spark):
    from automotive_translation_pipeline_spark.operators.windows import (
        time_weighted_avg,
    )

    rows = [
        # user 1: value 10 held 10s, value 20 held 30s -> twap 17.5
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-01 00:00:10", 20.0),
        (1, "2024-01-01 00:00:40", 99.0),  # final obs: zero weight
        # user 2: single event -> absent
        (2, "2024-01-01 00:00:00", 5.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "s", "value"]).select(
        "user_id", F.to_timestamp("s").alias("ts"), "value"
    )
    out = {r.user_id: r for r in time_weighted_avg(ev).collect()}
    assert out[1].twap == 17.5 and out[1].n_intervals == 2
    assert 2 not in out


def test_cumulative_unique_counts_first_appearance_only(spark):
    from automotive_translation_pipeline_spark.operators.windows import (
        cumulative_unique,
    )

    rows = [
        (1, "2024-01-01 08:00:00"),
        (1, "2024-01-02 08:00:00"),  # repeat: not new
        (2, "2024-01-02 08:00:00"),
        (3, "2024-01-02 09:00:00"),
        (2, "2024-01-03 08:00:00"),  # repeat
    ]
    ev = spark.createDataFrame(rows, ["user_id", "s"]).select(
        "user_id", F.to_timestamp("s").alias("ts")
    )
    out = {str(r.day): (r.new_keys, r.cumulative_keys)
           for r in cumulative_unique(ev).collect()}
    assert out == {"2024-01-01": (1, 1), "2024-01-02": (2, 3)}


def test_attribution_models_conserve_value(spark):
    from automotive_translation_pipeline_spark.operators.windows import (
        attribution_models,
    )

    rows = [
        # two views then a purchase of value 12 within 30 min
        (1, 1, "2024-01-01 00:00:00", "view", 0.0),
        (1, 2, "2024-01-01 00:10:00", "view", 0.0),
        (1, 3, "2024-01-01 00:20:00", "purchase", 12.0),
        # a view OUTSIDE the window of a later purchase
        (2, 4, "2024-01-01 00:00:00", "view", 0.0),
        (2, 5, "2024-01-01 02:00:00", "purchase", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_id", "s", "event_type", "value"]
    ).select("user_id", "event_id", F.to_timestamp("s").alias("ts"),
             "event_type", "value")
    out = {r.touch_id: r for r in attribution_models(ev).collect()}
    # first-touch: all 12 on touch 1; last-touch: all on touch 2;
    # linear: 6 each. The out-of-window view gets nothing.
    assert out[1].first_credit == 12.0 and out[1].last_credit == 0.0
    assert out[2].first_credit == 0.0 and out[2].last_credit == 12.0
    assert out[1].linear_credit == 6.0 and out[2].linear_credit == 6.0
    assert 4 not in out
    # every model conserves total credited value
    for m in ("first_credit", "last_credit", "linear_credit"):
        assert sum(getattr(r, m) for r in out.values()) == 12.0


def test_source_vocab_overlap_via_catalog(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["text_source_vocab_overlap"](
        spark, sf_dir
    ).collect()
    assert rows  # some pair exists at sf0.001
    for r in rows:
        assert r.source_a < r.source_b
        assert 0.0 <= r.jaccard <= 1.0


def test_centroid_affinity_bounds_and_pairs(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["embedding_centroid_affinity"](
        spark, sf_dir
    ).collect()
    labels = set()
    for r in rows:
        labels.add(r.label_a), labels.add(r.label_b)
        assert r.label_a < r.label_b
        assert -1.0 <= r.cosine <= 1.0
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2  # every unordered pair once


def test_int8_topk_recall_vs_float(spark, sf_dir):
    from automotive_translation_pipeline_spark.operators.embeddings import (
        cosine_topk_int8,
    )
    from automotive_translation_pipeline_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from automotive_translation_pipeline_spark.sources.readers import (
        load_testdata,
    )

    emb = load_testdata(spark, sf_dir)["embeddings"]
    qs = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(emb, qs, k=10).collect()
    }
    quant = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_int8(emb, qs, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8  # int8 at 64 dims loses little


def test_grouped_quantiles_disc_exactness(spark):
    from automotive_translation_pipeline_spark.operators.stats import (
        grouped_quantiles_disc,
    )

    # group g: values 1..10 -> p50 = 5 (ceil(.5*10)), p90 = 9
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 11)] + [("h", 42.0)],
        ["grp", "v"],
    )
    out = {
        (r.grp, r.q): r.value
        for r in grouped_quantiles_disc(df, ["grp"], "v", [0.5, 0.9]).collect()
    }
    assert out == {
        ("g", 0.5): 5.0, ("g", 0.9): 9.0,
        ("h", 0.5): 42.0, ("h", 0.9): 42.0,
    }
    # every returned value is an actual data value (discrete contract)


def test_triangle_counts_high_degree_hub(spark):
    """Degree-ordered orientation: a star hub (high degree, LOW id —
    the id-ordered worst case, all edges formerly fanning OUT of it)
    plus two triangles through the hub. Counts must be exact and the
    hub's forward fan-out in the oriented edge list must be 0 (every
    hub edge points INTO the hub)."""
    from automotive_translation_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # hub = node 0 connected to 1..20; triangles (0,1,2) and (0,3,4)
    edges = [(0, i) for i in range(1, 21)] + [(1, 2), (3, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.node: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert out == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_pagerank_checkpoint_bounds_plan_growth(spark):
    """10 iterations with the default (checkpoint=True) must keep the
    logical plan flat — the final plan hangs off a checkpointed scan
    (LogicalRDD / ExistingRDD), not 10 stacked join+agg subtrees; the
    unfenced variant's plan string grows ~linearly per round."""
    from automotive_translation_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)]]
        + [(b, a) for a, b in [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)]],
        "u long, v long",
    )
    fenced = pagerank(edges, iterations=10)
    unfenced = pagerank(edges, iterations=10, checkpoint=False)
    p_fenced = fenced._jdf.queryExecution().analyzed().toString()
    p_unfenced = unfenced._jdf.queryExecution().analyzed().toString()
    assert "ExistingRDD" in p_fenced or "LogicalRDD" in p_fenced
    assert len(p_fenced) < len(p_unfenced) / 3
    # and the fenced values are the real ranks (same as unfenced)
    want = {r.node: r.pr_rel for r in unfenced.collect()}
    got = {r.node: r.pr_rel for r in fenced.collect()}
    assert got == want
