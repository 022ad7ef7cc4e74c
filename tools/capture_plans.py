"""Capture .explain("formatted") output for named catalog queries.

    python tools/capture_plans.py --out plans/r10 --suffix _before \
        --only search_rrf_hybrid,embedding_pca_recon

Writes <out>/<query><suffix>.txt — the optimization-round evidence files
(the judge checks plan claims against these, guide §7.2).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--only", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from automotive_translation_pipeline_spark.session import get_spark

    spark = get_spark(app_name="capture_plans", cpus=args.cpus)
    qs = entrymod.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.only.split(","):
        spark.catalog.clearCache()
        df = qs[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} chars, Exchange x{n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
