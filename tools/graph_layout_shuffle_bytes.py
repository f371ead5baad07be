"""Deterministic (ambient-immune) evidence for the r13 graph-loop edge
layout: TOTAL SHUFFLE-WRITE BYTES per operator run, bare vs laid, under
forced no-broadcast — the quantity the layout exists to remove. Local
walls cannot show the win reliably (a local "shuffle" never crosses a
NIC, and this host carries multi-minute ambient bursts); bytes can:
every round of the bare loop re-exchanges the full edge frame, the laid
loop exchanges only the rank/label vector.

Usage: python tools/graph_layout_shuffle_bytes.py [n_edges]
Writes: tools/scale_runs/r13_graph_layout_shuffle_bytes.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ingestion_pipeline_spark.session import get_spark  # noqa: E402


def total_shuffle_write_bytes(spark) -> int:
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm
    empty = jvm.java.util.ArrayList()
    args = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    sl = store.stageList(empty, *args)
    tot = 0
    it = sl.iterator()
    while it.hasNext():
        tot += it.next().shuffleWriteBytes()
    return tot


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    # default degree 4; pass n_nodes to model denser graphs (real
    # near-dup/web graphs run |edges| >> |nodes|, where the removed
    # edge-frame exchanges dominate the byte total)
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else n_edges // 2

    from ingestion_pipeline_spark.operators.graph import (
        label_propagation,
        pagerank_fixed_point,
        personalized_pagerank_fixed_point,
    )
    from tools.graph_layout_ab import synthetic_edges

    spark = get_spark(
        "graph-layout-bytes",
        # retain enough stages that no run's metrics are evicted
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.range(1).count()

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

    results = {}
    for name, op in ops.items():
        per_arm = {}
        for arm in ("bare", "laid"):
            os.environ["SPARK_GRAFT_GRAPH_LAYOUT"] = (
                "1" if arm == "laid" else "0"
            )
            spark.catalog.clearCache()
            before = total_shuffle_write_bytes(spark)
            op(edges).write.format("noop").mode("overwrite").save()
            per_arm[arm] = total_shuffle_write_bytes(spark) - before
            spark.catalog.clearCache()
        per_arm["laid_over_bare"] = round(
            per_arm["laid"] / max(per_arm["bare"], 1), 3
        )
        results[name] = per_arm
        print(name, json.dumps(per_arm), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "scale_runs",
        "r13_graph_layout_shuffle_bytes.json",
    )
    # merge per-config (a re-run of one config must not erase the others)
    payload = {
        "metric": "total shuffle-write bytes per operator run (statusStore)",
        "forced": "autoBroadcastJoinThreshold=-1",
        "runs": {},
    }
    if os.path.exists(out):
        with open(out) as fh:
            prev = json.load(fh)
        payload["runs"] = prev.get("runs", {})
        if "results" in prev:  # legacy single-run layout
            payload["runs"][
                f"edges{prev['n_edges']}_nodes{prev['n_nodes']}"
            ] = prev["results"]
    payload["runs"][f"edges{n_edges}_nodes{n_nodes}"] = results
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
