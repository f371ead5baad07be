"""Local mimic of the driver's t2 differential check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, comparing row count, column names,
and an order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.10g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from ingestion_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = queries(), oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        dcols = list(ddf.columns)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema {sorted(scols)} != {sorted(dcols)}")
            failed.append(name)
            continue
        if len(srows) != len(ddf):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(ddf)}")
            failed.append(name)
            continue
        s_norm = normalize([r.asDict() for r in srows], sorted(scols))
        d_norm = normalize(ddf.to_dict("records"), sorted(scols))
        if s_norm != d_norm:
            diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diffs}")
            failed.append(name)
            continue
        print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
