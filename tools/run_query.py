"""Run any registry query by name and print its result — the
switched-from-the-reference user's entry point for ad-hoc use.

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py v_cosine_top8 --sf /root/testdata/sf0.01 --limit 5
    python tools/run_query.py --list           # every query + one-line doc
    python tools/run_query.py --explain q5_region_revenue
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="table directory")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument("--explain", action="store_true", help="formatted plan instead of rows")
    ap.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL and exit")
    args = ap.parse_args()

    from ingestion_pipeline_spark.plans import REGISTRY, query_map
    from ingestion_pipeline_spark.session import get_spark

    if args.list or not args.name:
        for name in query_map():
            doc = REGISTRY[name].doc.split(". ")[0][:100]
            gate = "oracle" if REGISTRY[name].sql else "rows-only"
            print(f"{name:36} [{gate}]  {doc}")
        return 0

    qm = query_map()
    if args.name not in qm:
        import difflib

        near = difflib.get_close_matches(args.name, qm, n=3)
        print(f"unknown query {args.name!r}" + (f"; did you mean: {', '.join(near)}" if near else ""))
        return 2

    if args.oracle:
        spec = REGISTRY[args.name]
        print(spec.sql.strip() if spec.sql else f"# {args.name} is rows-only (no SQL oracle)")
        return 0

    spark = get_spark("run-query")
    t0 = time.perf_counter()
    df = qm[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=60)
    n = df.count()
    print(f"# {args.name}: {n} rows in {time.perf_counter() - t0:.2f}s at {args.sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
