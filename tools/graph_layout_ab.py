"""Forced no-broadcast interleaved A/B for the r13 graph-loop edge
layout (VERDICT r12 #1).

The layout path (`operators/graph.py:_layout_loop_frame`) only engages
when the rank/label vector cannot broadcast — a regime no sf0.1 bench
graph reaches — so this tool forces it:
`spark.sql.autoBroadcastJoinThreshold=-1`, a synthetic deterministic
graph large enough that per-round work is real, and ABBA-interleaved
arms inside ONE session (host discipline: ambient load bursts hit both
arms equally). The bare arm disables the layout with
`SPARK_GRAFT_GRAPH_LAYOUT=0` (read per operator call), i.e. the exact
r12 loop shape.

Timing includes the build (the loops execute their checkpoints at
build), plus a noop write of the result — the bench methodology.

Usage: python tools/graph_layout_ab.py [n_edges] [rounds] [n_nodes]
Writes: tools/scale_runs/r13_graph_layout_ab.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ingestion_pipeline_spark.session import get_spark  # noqa: E402


def synthetic_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic pseudo-random edge list (no rand(): retried tasks
    must reproduce rows — guide §2.5)."""
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_nodes)).alias(
            "dst"
        ),
    ).filter(F.col("src") != F.col("dst"))


def run_arm(spark, op, edges, layout: bool) -> float:
    os.environ["SPARK_GRAFT_GRAPH_LAYOUT"] = "1" if layout else "0"
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    out = op(edges)
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 3)


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # default degree 4; denser graphs (|edges| >> |nodes|, the real
    # near-dup/web regime) make the removed edge exchanges dominate
    n_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else n_edges // 2

    from ingestion_pipeline_spark.operators.graph import (
        label_propagation,
        pagerank_fixed_point,
        personalized_pagerank_fixed_point,
    )

    spark = get_spark("graph-layout-ab")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.range(1).count()  # session warm-up

    edges = synthetic_edges(spark, n_edges, n_nodes).localCheckpoint(
        eager=True
    )
    seeds = spark.range(0, n_nodes, 50).select(F.col("id").alias("n"))

    ops = {
        "pagerank_fixed_point": lambda e: pagerank_fixed_point(
            e, "src", "dst", iters=10
        ),
        "label_propagation": lambda e: label_propagation(
            e, "src", "dst", iters=4
        ),
        "personalized_pagerank": lambda e: personalized_pagerank_fixed_point(
            e, seeds, "src", "dst", iters=10
        ),
    }

    results: dict[str, dict[str, list[float]]] = {}
    for name, op in ops.items():
        spark.sparkContext.setJobDescription(f"layout-ab: {name}")
        arms: dict[str, list[float]] = {"bare": [], "laid": []}
        # ABBA interleave: bare,laid,laid,bare per rep pair
        order = (["bare", "laid"], ["laid", "bare"])
        for r in range(reps):
            for arm in order[r % 2]:
                arms[arm].append(run_arm(spark, op, edges, arm == "laid"))
        results[name] = {
            **arms,
            "min_ratio_laid_over_bare": round(
                min(arms["laid"]) / min(arms["bare"]), 3
            ),
        }
        print(name, json.dumps(results[name]), flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "scale_runs",
        "r13_graph_layout_ab.json",
    )
    # merge per-config (a re-run of one config must not erase the others)
    payload = {
        "forced": "autoBroadcastJoinThreshold=-1",
        "runs": {},
    }
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        payload["runs"] = prev.get("runs", {})
        if "results" in prev:  # legacy single-run layout
            payload["runs"][
                f"edges{prev['n_edges']}_nodes{prev['n_nodes']}_reps{prev['reps_per_arm']}"
            ] = prev["results"]
    payload["runs"][f"edges{n_edges}_nodes{n_nodes}_reps{reps}"] = results
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
