"""r13 graph-loop edge layout (VERDICT r12 #1): the non-broadcast
regime lays the static edge frame out by the loop's join key once
(persist keeps partitioning; size-derived partition count) instead of
re-exchanging it every round.

Pins:
- bit-equality of every loop operator with the layout engaged
  (forced autoBroadcastJoinThreshold=-1) vs the plain r12 path;
- the plan fact the layout exists for: a join against the laid frame
  carries NO Exchange on the edge side (only the vector side shuffles);
- the conf-size parser used by the engagement test.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ingestion_pipeline_spark.operators.graph import (
    _layout_loop_frame,
    _size_bytes,
    connected_components,
    label_propagation,
    pagerank_fixed_point,
    personalized_pagerank_fixed_point,
)


def _edges(spark):
    # two components + a chain: exercises >1 round in every loop
    rows = [
        (1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (1, 5),
        (20, 21), (21, 22), (22, 20), (5, 6), (6, 7),
    ]
    return spark.createDataFrame(rows, "src long, dst long")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def forced_no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        os.environ.pop("SPARK_GRAFT_GRAPH_LAYOUT", None)
        spark.catalog.clearCache()


def test_size_bytes_parser():
    assert _size_bytes("-1", 0) == -1
    assert _size_bytes("10485760", 0) == 10485760
    assert _size_bytes("10MB", 0) == 10 * 1024 * 1024
    assert _size_bytes("64m", 0) == 64 * 1024 * 1024
    assert _size_bytes("1g", 0) == 1024**3
    assert _size_bytes("512k", 0) == 512 * 1024
    assert _size_bytes("10485760b", 0) == 10485760
    assert _size_bytes("garbage", 7) == 7


def test_loop_operators_bit_equal_laid_vs_bare(forced_no_broadcast):
    spark = forced_no_broadcast
    e = _edges(spark)
    seeds = spark.createDataFrame([(1,), (20,)], "n long")
    ops = {
        "cc": lambda: connected_components(e, "src", "dst"),
        "lpa": lambda: label_propagation(e, "src", "dst", iters=4),
        "pr": lambda: pagerank_fixed_point(e, "src", "dst", iters=10),
        "ppr": lambda: personalized_pagerank_fixed_point(
            e, seeds, "src", "dst", iters=10
        ),
    }
    for name, op in ops.items():
        os.environ["SPARK_GRAFT_GRAPH_LAYOUT"] = "0"
        bare = _rows(op())
        spark.catalog.clearCache()
        os.environ["SPARK_GRAFT_GRAPH_LAYOUT"] = "1"
        laid = _rows(op())
        spark.catalog.clearCache()
        assert laid == bare, f"{name}: layout changed the result"


def test_laid_frame_join_is_exchange_free_on_edge_side(forced_no_broadcast):
    spark = forced_no_broadcast
    e = _edges(spark).select(
        F.col("src").alias("s"), F.col("dst").alias("d")
    ).localCheckpoint(eager=True)
    laid, n_parts = _layout_loop_frame(e, "s", e.count())
    vec = spark.range(30).select(F.col("id").alias("s"), F.lit(1).alias("r"))
    plan = (
        laid.join(vec, "s").groupBy("d").agg(F.sum("r").alias("c"))
    )._jdf.queryExecution().executedPlan().toString()
    # the edge side must come straight off the cache: the only
    # requirement-driven exchanges are the vector side + the aggregate
    # (the cache subtree's own REPARTITION_BY_NUM executed once at
    # materialization and is merely displayed under InMemoryRelation)
    assert "InMemoryTableScan" in plan
    assert plan.count("ENSURE_REQUIREMENTS") == 2, plan

    # the loop's real hazard (measured): a vector arriving with its own
    # VALID hash partitioning at a different count makes
    # EnsureRequirements re-exchange the CACHE — the loops therefore
    # co-partition the vector explicitly; pin that the co-partitioned
    # join leaves zero requirement-driven exchanges above the join
    vec2 = (
        spark.range(60)
        .select(F.col("id").alias("s"), F.lit(1).alias("r"))
        .groupBy("s")
        .agg(F.sum("r").alias("r"))  # valid hash(s, shuffle.partitions)
        .repartition(n_parts, "s")   # the loops' co-partition step
    )
    plan2 = (
        laid.join(vec2, "s").groupBy("d").agg(F.sum("r").alias("c"))
    )._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("ENSURE_REQUIREMENTS") == 1, plan2  # aggregate only
    laid.unpersist()


def test_layout_partition_count_is_size_derived(forced_no_broadcast):
    spark = forced_no_broadcast
    e = _edges(spark).select(
        F.col("src").alias("s"), F.col("dst").alias("d")
    ).localCheckpoint(eager=True)
    laid, n_parts = _layout_loop_frame(e, "s", e.count())
    # 12 edges x 48 B << one advisory partition: the layout must NOT
    # pin the local core count (the r12 §20 failure mode); floor is 2
    # (repartition(1, key) loses HashPartitioning — see the operator)
    assert n_parts == 2
    assert laid.rdd.getNumPartitions() == 2
    laid.unpersist()
