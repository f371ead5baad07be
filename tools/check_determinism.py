"""Partition-independence gate: every registry query must produce the
IDENTICAL result (exact values, compared as sorted row multisets) when
the shuffle layout changes.

Why: the DuckDB differential proves Spark-vs-oracle agreement for ONE
partitioning. A float aggregate folded in partition order can match
today and flake tomorrow when the shuffle layout shifts (the class
fixed in tx_unigram_surprisal, round 4). This gate re-runs each query
with ``spark.sql.shuffle.partitions`` = 32 then 7 — different shuffle
fan-in reorders rows inside every aggregation — and fails on any
difference, float or otherwise.

Usage:
    python tools/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _snapshot(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(repr(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows)


def main() -> int:
    from __spark_entry__ import queries
    from ingestion_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-determinism")
    qs = queries()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = _snapshot(fn(spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = _snapshot(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            failed.append(name)
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: partition-dependent result, e.g. {diffs}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(a)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
