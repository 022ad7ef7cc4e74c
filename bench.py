"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query executes fully through the noop sink (no collect-to-driver
bottleneck, no count()-style column pruning that would skip the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline workload: the flagship pipeline + classic join/agg shapes +
# the extension operators that dominate cost at scale.
HEADLINE = [
    "pipeline_rows",
    "pipeline_rows_staged",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_suppliers",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_revenue",
    "tpch_q13_order_distribution",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_relationship",
    "tpch_q20_excess_stock",
    "r17_pack_cumsum",
    "r17_pack_greedy",
    "r25_last_wins",
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_view_attribution",
    "dedup_minhash_candidates",
    "dedup_ngram_jaccard",
    "dedup_exact_groups",
    "dedup_components",
    "ann_cosine_topk",
    "text_quality_scores",
    "curation_pipeline_rows",
    "events_sessionize_batch",
    "ts_ffill_purchase_value",
    "heavy_hitters_words",
    "unpivot_lineitem_measures",
    "folder_status_taxonomy",
    "multimodal_feature_stats",
    "decontaminate_train_eval",
    "dedup_canonical_survivors",
    "text_chunk_windows",
    "dedup_segment_overlap",
    "curation_pack_chunks",
    "text_unigram_surprisal",
    "embedding_label_outliers",
    "text_split_drift",
    "text_collapse_repeats",
    "search_bm25_topk",
    "text_char_entropy",
    "dedup_sorted_neighbors",
    "events_cohort_retention",
    "cdc_apply_changes",
    "profile_equidepth_histogram",
    "bloom_pruned_semi_join",
    "stats_mad_outliers",
    "events_type_cooccurrence",
    "graph_pagerank_dup_hubs",
    "graph_triangle_counts",
    "embedding_int8_quantize",
    "text_bigram_surprisal",
    "stream_static_enrich",
    "orc_roundtrip_profile",
    "stats_grouped_ols_trend",
    "events_markov_transitions",
    "search_rrf_hybrid",
    "dedup_prefix_jaccard",
    "events_time_weighted_avg",
    "events_cumulative_unique_users",
    "events_attribution_models",
    "text_source_vocab_overlap",
    "embedding_centroid_affinity",
    "sql_recursive_bfs_hops",
    "profile_psi_drift",
    "profile_pareto_coverage",
    "stream_view_attribution_outer",
    "ann_cosine_int8",
    "embedding_dim_stats",
    "events_gap_quantiles",
    "events_user_top_type",
    "dedup_rate_by_source",
    "lineitem_delay_quantiles",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from automotive_translation_pipeline_spark.session import get_spark

    spark = get_spark(app_name="atp_spark_bench", cpus=CPUS)
    qs = entrymod.queries()

    # Warm the JVM/codegen once so per-query numbers measure the plan,
    # not first-call JIT: a tiny-SF run of the flagship compiles the
    # parse-cascade codegen and spawns the Python workers (~9 s of pure
    # one-time overhead otherwise attributed to the first measured query).
    qs["r23_group_by_language"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    qs["pipeline_rows"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # 3 runs per query, report min AND median: the container's CPU
    # availability is noisy (co-tenant bursts showed 5x swings on
    # identical plans) — the min is the plan's cost, min≈median means
    # the number is trustworthy, min≪median flags a noisy neighborhood
    # so the artifact is self-diagnosing. clearCache() between runs
    # drops persist()'d intermediates so no query pays for (or benefits
    # from) another query's cached state.
    N_RUNS = 3
    per_query: dict[str, float] = {}
    per_query_median: dict[str, float] = {}
    per_query_times: dict[str, list[float]] = {}
    for name in HEADLINE:
        times = []
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        # All raw times in RUN ORDER (VERDICT r3 item 7): noise
        # adjudication needs the full sample, not just min/median.
        per_query_times[name] = list(times)
        times.sort()
        per_query[name] = times[0]
        per_query_median[name] = times[len(times) // 2]

    # Engine-side throughput of the flagship (the BASELINE.md comparable:
    # rows through pack→translate→parse→rejoin→flags per second, warm).
    pipeline_warm = float("inf")
    for _ in range(N_RUNS):
        spark.catalog.clearCache()
        t0 = time.time()
        n_rows = qs["pipeline_rows"](spark, SF_DIR).count()
        pipeline_warm = min(pipeline_warm, time.time() - t0)

    total = round(sum(per_query.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # KEY ORDER IS A CONTRACT: the driver records only the trailing
    # ~2000 chars of this line, so the big per-query blobs go FIRST and
    # every summary metric goes LAST (round 4's tail-truncated artifact
    # kept only an attachment and lost the headline numbers).
    payload = {
        "queries_times": per_query_times,
        "queries_median": per_query_median,
        "queries": per_query,
        "runs_per_query": N_RUNS,
        "cpus": CPUS,
    }
    # Scale evidence: compact pointers to the committed sf1/sf3 runs
    # (same suite + harness, data from tools/gen_testdata.py — see
    # SCALE.md "Measured scale-up"); per-query numbers live in the
    # committed files themselves.
    here = os.path.dirname(os.path.abspath(__file__))
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    for committed_sf, fname in ((1.0, "BENCH_sf1.json"),
                                (3.0, "BENCH_sf3.json")):
        path = os.path.join(here, fname)
        if not os.path.exists(path) or sf_val == committed_sf:
            continue
        try:
            with open(path) as fh:
                run = json.load(fh)
            payload[f"sf{committed_sf:g}_committed_run"] = {
                "value": run.get("value"),
                "n_queries": len(run.get("queries") or {}),
                "pipeline_rows": run.get("pipeline_rows"),
                "pipeline_rows_per_sec_warm": run.get(
                    "pipeline_rows_per_sec_warm"
                ),
                "provenance": f"committed {fname} "
                f"(data: tools/gen_testdata.py --sf {committed_sf:g})",
            }
        except (OSError, ValueError):
            pass
    payload.update(
        {
            "pipeline_rows": n_rows,
            "pipeline_rows_per_sec_warm": round(
                n_rows / max(pipeline_warm, 1e-9), 1
            ),
            "n_queries": len(per_query),
            "sf": sf_val,
            "unit": "sec",
            "metric": "headline_suite_wall_time",
            "value": total,
        }
    )
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
