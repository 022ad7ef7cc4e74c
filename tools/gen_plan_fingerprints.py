"""Golden physical-plan fingerprints for the heaviest catalog queries.

The individual plan-contract tests (tests/test_plans_physical.py) pin
specific shapes — a broadcast here, a pushdown there. This tool pins the
WHOLE physical operator multiset for the top-cost queries, so a future
edit that un-broadcasts a join, un-prunes a scan, or adds a shuffle
fails CI the day it lands instead of surfacing as a bench regression a
round later (round-6 verdict #7).

Fingerprint = {physical node name: count} from a py4j walk of
``executedPlan()`` children (NOT the plan string: the string re-prints
each cached subtree under every InMemoryTableScan reference, inflating
counts; tree children don't descend into cached relations).

Regenerate deliberately after a plan-shape change you intend:

    python tools/gen_plan_fingerprints.py          # rewrites the JSON

The committed JSON is diffed against live plans by
tests/test_plan_fingerprints.py at the same SF/session config, so the
fingerprints are deterministic.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")

# Top-cost queries by BENCH_r06 per-query seconds, plus the two
# composed flagships (pipeline_rows, curation_full_pipeline) whose
# whole point is cross-operator shape.
GUARDED = [
    "pipeline_rows",
    "curation_full_pipeline",
    "dedup_semantic_prune",
    "sql_recursive_bfs_hops",
    "sample_dsir_weights",
    "lineitem_delay_quantiles",
    "basket_brand_lift",
    "dedup_winnow_pairs",
    "text_doc_signals",
    "text_bpe_train_merges",
    "text_bpe_tokenize_stats",
    "profile_psi_drift",
    "dedup_remove_duplicate_spans",
    "dedup_duplicate_spans",
    "events_gap_quantiles",
    "ann_cosine_int8",
    "dedup_remove_dup_segments",
    "embedding_pca_recon",
    "text_quality_classifier",
    "dedup_rate_by_source",
    "sample_temperature_mixture",
    "events_attribution_models",
]


def plan_fingerprint(df) -> dict[str, int]:
    """Physical operator multiset via a child-walk of executedPlan."""
    counts: Counter = Counter()

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # AQE hides the whole tree behind a childless wrapper until
            # execution; fingerprint the pre-execution initial plan
            # (deterministic — runtime re-plans are the part AQE owns).
            walk(node.initialPlan())
            return
        counts[name] += 1
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return dict(sorted(counts.items()))


def compute_all(spark) -> dict[str, dict[str, int]]:
    from automotive_translation_pipeline_spark import queries_catalog as qc

    qs = qc.queries()
    out = {}
    for name in GUARDED:
        spark.catalog.clearCache()
        out[name] = plan_fingerprint(qs[name](spark, SF_DIR))
    return out


if __name__ == "__main__":
    from automotive_translation_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan_fingerprints", cpus=8)
    fps = compute_all(spark)
    with open(OUT, "w") as fh:
        json.dump(fps, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(fps)} fingerprints -> {OUT}")
    spark.stop()
