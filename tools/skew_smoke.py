"""Skew-mitigation payoff measurement (VERDICT r4 directive #8).

The salted operators in ``operators/skew.py`` are proven
RESULT-IDENTICAL to their unsalted forms at fixture scale
(tests/test_skew.py, driver-graded ``j_salted_brand_revenue`` /
``g_salted_collect_docs`` whose oracles ARE the unsalted queries).  What
fixture scale cannot show is the PAYOFF — on 60k rows every layout
finishes instantly.  This tool builds a deterministic skewed dataset
(90% of rows on ONE hot key, the remainder uniform over ``n_keys``) at
10x / 100x the sf0.1 events row count and times each mitigation against
its unsalted twin:

- **salted collect_list** vs plain ``groupBy(key).collect_list`` — the
  shape AQE can NEVER split (collect has no partial aggregation: every
  value of the hot key funnels through one reducer task regardless of
  adaptive planning).
- **salted shuffle join** vs unsalted sort-merge join with AQE's
  skew-join splitting DISABLED — isolating the manual mitigation — and,
  as the honest third column, the unsalted join with AQE skew handling
  ON (where Spark's own splitting is expected to compete; salting
  exists for the join-feeds-window case AQE cannot split).

Broadcast is disabled for the joins: a broadcastable dim needs no
salting at all (broadcast joins do not shuffle the fact side), so the
comparison targets the above-threshold-dim regime the operator
documents.  Result-identity is re-asserted at smoke scale via count +
checksum equality before timings are reported.

Usage::

    python tools/skew_smoke.py [k ...]    # default: 10 100

Prints one JSON line per k:
    {"k": K, "rows": N, "collect": {"unsalted": s, "salted": s},
     "join": {"unsalted_noaqe": s, "salted": s, "unsalted_aqe": s}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sf0.1 events row count is ~60k; "10x/100x" mirror the established
# scale_smoke convention of growing the largest driver fixture.
BASE_ROWS = 60_000
N_KEYS = 1_000
HOT_SHARE = 0.9  # 9 of every 10 rows land on key 0
N_SALTS = 32


def build_skewed(spark, n_rows: int):
    """Deterministic skewed fact table: 90% of rows on key 0, the rest
    spread uniformly (by hash) over 1..N_KEYS-1."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_rows)
        .select(
            F.when(
                F.pmod(F.col("id"), F.lit(10)) < F.lit(int(HOT_SHARE * 10)),
                F.lit(0),
            )
            .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)))
            .alias("key"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).alias("v"),
            F.col("id"),
        )
        .repartition(32)
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def checksum(df, col: str):
    from pyspark.sql import functions as F

    return df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal space: full-range long hashes overflow an ANSI bigint sum
        F.sum(F.xxhash64(col).cast("decimal(38,0)")).alias("h"),
    ).first()


def main() -> int:
    from pyspark.sql import functions as F

    from ingestion_pipeline_spark.operators.skew import (
        salted_collect_list,
        salted_join,
    )
    from ingestion_pipeline_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("skew-smoke")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    failures = 0
    for k in ks:
        n = BASE_ROWS * k
        scratch = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale", "skew_facts.parquet",
        )
        build_skewed(spark, n).write.mode("overwrite").parquet(scratch)
        facts = spark.read.parquet(scratch)
        dim = spark.range(N_KEYS).select(
            F.col("id").alias("key"), (F.col("id") * 7).alias("weight")
        )

        # --- collect_list: the AQE-unsplittable shape ---
        unsalted_collect = facts.groupBy("key").agg(
            F.sort_array(F.collect_list("v")).alias("values")
        )
        salted_collect = salted_collect_list(
            facts, ["key"], "v", salt_from=F.col("id"), n_salts=N_SALTS
        )
        # result-identity at smoke scale (count + value checksum), then time
        a = checksum(unsalted_collect.select(F.md5(F.to_json(F.struct("key", "values"))).alias("r")), "r")
        b = checksum(salted_collect.select(F.md5(F.to_json(F.struct("key", "values"))).alias("r")), "r")
        if (a["n"], a["h"]) != (b["n"], b["h"]):
            print(f"# k={k}: COLLECT RESULT MISMATCH {a} vs {b}", file=sys.stderr)
            failures += 1
        collect_times = {
            "unsalted": timed(unsalted_collect),
            "salted": timed(salted_collect),
        }

        # --- shuffle join (dim above broadcast threshold by config) ---
        def join_out(joined):
            return joined.groupBy("key").agg(
                F.sum(F.col("v") * F.col("weight")).alias("wv")
            )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        unsalted_join_noaqe = join_out(facts.join(dim, "key"))
        t_unsalted_noaqe = timed(unsalted_join_noaqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t_unsalted_aqe = timed(join_out(facts.join(dim, "key")))
        salted = join_out(
            salted_join(facts, dim, "key", salt_from=F.col("id"), n_salts=N_SALTS)
        )
        a = checksum(unsalted_join_noaqe.select(F.md5(F.to_json(F.struct("key", "wv"))).alias("r")), "r")
        b = checksum(salted.select(F.md5(F.to_json(F.struct("key", "wv"))).alias("r")), "r")
        if (a["n"], a["h"]) != (b["n"], b["h"]):
            print(f"# k={k}: JOIN RESULT MISMATCH {a} vs {b}", file=sys.stderr)
            failures += 1
        t_salted = timed(salted)

        print(
            json.dumps(
                {
                    "k": k,
                    "rows": n,
                    "collect": collect_times,
                    "join": {
                        "unsalted_noaqe": t_unsalted_noaqe,
                        "salted": t_salted,
                        "unsalted_aqe": t_unsalted_aqe,
                    },
                }
            )
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
