"""Spot-bench a subset of catalog queries at an arbitrary SF directory.

The per-round SCALE.md evidence (sf1 -> sf3 -> sf10 -> sf30 -> sf100
ratio tables) is produced with this tool: noop sink, N repeats with
cache cleared between them, min + median reported, ONE fresh Spark
session per invocation (heavy multi-sf sessions accumulate
localCheckpoint blocks and shuffle files — run one sf per process).

    python tools/spot_bench.py --sf .testdata/sf10 \
        --only dedup_ngram_jaccard,dedup_winnow_pairs --n 3

Prints one JSON line: {"sf_dir": ..., "queries": {name: min_sec},
"queries_median": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True, help="sf directory")
    ap.add_argument("--only", required=True, help="comma list of queries")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from automotive_translation_pipeline_spark import queries_catalog as qc
    from automotive_translation_pipeline_spark.session import get_spark

    spark = get_spark(app_name="atp_spot_bench", cpus=args.cpus)
    qs = qc.queries()
    names = [n.strip() for n in args.only.split(",") if n.strip()]
    mins: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        times = []
        for _ in range(args.n):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        mins[name] = round(min(times), 3)
        medians[name] = round(statistics.median(times), 3)
        print(f"  {name}: min={mins[name]} median={medians[name]}",
              file=sys.stderr)
    print(json.dumps({
        "sf_dir": args.sf,
        "n": args.n,
        "cpus": args.cpus,
        "queries": mins,
        "queries_median": medians,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
