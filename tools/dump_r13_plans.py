"""Dump `.explain("formatted")` for named registry queries into
plans/r13/<query>_<tag>.txt — the before/after plan evidence the r13
optimization round commits alongside each change.

    python tools/dump_r13_plans.py <tag> <query> [query ...]
    python tools/dump_r13_plans.py --sf /root/testdata/sf0.1 after q1 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ingestion_pipeline_spark.plans import query_map
    from ingestion_pipeline_spark.session import get_spark

    spark = get_spark("dump-r13-plans")
    qs = query_map()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_scan = plan.count("Scan parquet")
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_scan} parquet scans, {n_ex} Exchange -> {path}")
        # release any localCheckpoint blocks plan construction pinned
        try:
            spark.catalog.clearCache()
            it = (
                spark.sparkContext._jsc.sc()
                .getPersistentRDDs()
                .values()
                .iterator()
            )
            while it.hasNext():
                it.next().unpersist(False)
        except Exception:  # noqa: BLE001
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
