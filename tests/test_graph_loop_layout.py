"""Plan pins for the r12 scale-adaptive ``_loop_static`` layout
(`operators/graph.py`): a fixed-point loop's static edge frame is
checkpointed and — ONLY when the evolving rank/label vector is too big
to broadcast — hash-partitioned + sorted by the loop's join key and
persist()ed, so each round's join consumes it with NO Exchange and NO
Sort on the edge side. ``localCheckpoint`` alone erases partitioning
(LogicalRDD carries none), which is exactly what this pins against
regressing; at broadcastable vector sizes the bare checkpoint is kept
(byte-identical to the pre-r12 shape — the layout job measured
+0.3-0.6 s per graph query locally for zero local benefit). Value
equality of the operators themselves is pinned by
tests/test_graph_fixture_exact.py; this module pins the PLAN property
and the scale decision.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestion_pipeline_spark.operators.graph import (
    _loop_static,
    _vector_broadcasts,
)


def _fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _round_join(spark, static):
    """One loop round: static⋈vector on the key + a regrouping agg —
    the shape every graph fixed-point iteration compiles to."""
    vec = spark.range(100).select(
        F.col("id").alias("s"), F.lit(7).alias("rank_fp")
    )
    return (
        static.join(vec, "s")
        .groupBy("d")
        .agg(F.sum("rank_fp").alias("contrib"))
    )


def test_vector_broadcasts_reads_session_threshold(spark):
    assert _vector_broadcasts(spark, 100)
    assert not _vector_broadcasts(spark, 10**9)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # broadcasting disabled -> the vector NEVER broadcasts, any size
        assert not _vector_broadcasts(spark, 1)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_small_vector_keeps_bare_checkpoint(spark):
    """At broadcastable vector sizes _loop_static must stay the plain
    localCheckpoint — no cache, no extra layout job (the local bench
    path)."""
    edges = spark.range(1000).select(
        (F.col("id") % 100).alias("s"), (F.col("id") % 97).alias("d")
    )
    out = _loop_static(edges, "s", vector_rows=100)
    plan = _fmt_plan(out)
    assert "Scan ExistingRDD" in plan
    assert "InMemoryTableScan" not in plan


def test_loop_static_side_is_exchange_and_sort_free(spark):
    """Under a no-broadcast planner, the laid-out side of the round
    join must plan without its own Exchange or Sort (the cached layout
    satisfies both requirements); the identical frame materialized via
    bare localCheckpoint must need one of each — proving the layout,
    not AQE luck, is what removes them."""
    edges = spark.range(5000).select(
        (F.col("id") % 100).alias("s"), (F.col("id") % 97).alias("d")
    )
    old_conf = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
    )
    try:
        # threshold -1 -> the vector can never broadcast -> layout on.
        # _loop_static materializes its cache eagerly — required, since
        # an AQE-compiled cached plan reports unknown partitioning
        # until it has run and the join would re-exchange regardless.
        laid_out = _round_join(spark, _loop_static(edges, "s", 100))
        bare = _round_join(
            spark, edges.localCheckpoint(eager=True)
        )
        plan_new, plan_old = _fmt_plan(laid_out), _fmt_plan(bare)
        tree_new = plan_new.split("\n\n")[0].splitlines()
        tree_old = plan_old.split("\n\n")[0].splitlines()

        def branch_between(tree, top_marker, leaf_marker):
            """Lines strictly between the first node containing
            ``top_marker`` and its descendant containing
            ``leaf_marker`` — i.e. the operators the join side pays
            on top of its source."""
            i = next(n for n, l in enumerate(tree) if top_marker in l)
            j = next(
                n for n, l in enumerate(tree) if leaf_marker in l and n > i
            )
            return "\n".join(tree[i + 1 : j])

        # the cached side enters the join with no Exchange and no Sort
        # (a null-filter above the cache scan is fine)
        new_side = branch_between(tree_new, "Join", "InMemoryTableScan")
        assert "Exchange" not in new_side, plan_new
        assert "Sort" not in new_side, plan_new
        # the identical frame through a bare localCheckpoint pays both
        # (proving the layout, not planner luck, removed them)
        old_side = branch_between(tree_old, "Join", "Scan ExistingRDD")
        assert "Exchange" in old_side, plan_old
        assert "Sort" in old_side, plan_old
    finally:
        for k, v in old_conf.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
