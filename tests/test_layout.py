"""Z-order layout: interleave correctness + the actual data-skipping
property (per-partition min/max spans tighten in BOTH dimensions)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ingestion_pipeline_spark.operators.layout import cluster_by_zorder, zorder_key


def _interleave(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python(spark):
    rows = [(x, y) for x in range(0, 40, 3) for y in range(0, 40, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave(x, y)


def test_cluster_tightens_both_dimensions(spark):
    # a 64x64 grid: single-column sort leaves the OTHER column's
    # per-partition span at the full domain; z-order bounds both
    n = 64
    grid = (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    )

    def partition_spans(df):
        spans = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        mx = max(r["sx"] for r in spans)
        my = max(r["sy"] for r in spans)
        return mx, my

    by_x = grid.repartitionByRange(16, "x")
    zed = cluster_by_zorder(grid, zorder_key(F.col("x"), F.col("y")), partitions=16)

    x_mx, x_my = partition_spans(by_x)
    z_mx, z_my = partition_spans(zed)

    # single-column layout: y spans the whole domain in every partition
    assert x_my == n - 1
    # z-order: BOTH dimensions materially tighter than the full domain
    assert z_mx <= n // 2
    assert z_my <= n // 2


def test_cluster_preserves_rows(spark):
    grid = spark.range(1000).select(
        (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
    )
    out = cluster_by_zorder(grid, zorder_key(F.col("x"), F.col("y")), partitions=4)
    assert out.columns == ["x", "y"]
    assert out.count() == 1000
