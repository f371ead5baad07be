"""Twenty-second registry tranche: write-side layout + robust score
normalization.

- ``g_zorder_orders``: the Z-order (Morton) clustering key over
  (customer, order-day) — multi-dimensional data-skipping layout; the
  gate value-checks the bit interleave and its ordering.
- ``s_winsorized_quality``: per-group percentile winsorization
  (clamp to [p10, p90]) — the standard robust normalization before
  mixing quality scores across heterogeneous sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.layout import zorder_key, zorder_sql
from ..sources.parquet_tables import table
from .registry import register

_DAY = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"


@register(
    "g_zorder_orders",
    f"""
    SELECT o_orderkey, z FROM (
        SELECT o_orderkey,
               {zorder_sql("o_custkey", _DAY)} AS z
        FROM orders
    )
    ORDER BY z, o_orderkey
    LIMIT 200
    """,
    "Z-order clustering key: interleave the low 16 bits of o_custkey "
    "and the order's epoch-day so ONE sort key gives every interleaved "
    "column per-file min/max locality (multi-dimensional data "
    "skipping — what partition pruning can't do beyond its single "
    "column). Pure codegen bit math; the write path is "
    "operators/layout.py:cluster_by_zorder (repartitionByRange on the "
    "key + within-partition sort). The gate value-checks the "
    "interleave and its total order.",
)
def g_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    z = zorder_key(F.col("o_custkey"), day)
    return (
        orders.select("o_orderkey", z.alias("z"))
        .orderBy("z", "o_orderkey")
        .limit(200)
    )


@register(
    "s_winsorized_quality",
    """
    WITH scored AS (
        SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS raw
        FROM documents
    ),
    bounds AS (
        SELECT source,
               ROUND(quantile_cont(raw, 0.1), 6) AS lo,
               ROUND(quantile_cont(raw, 0.9), 6) AS hi
        FROM scored GROUP BY source
    )
    SELECT s.doc_id, s.source, s.raw,
           LEAST(GREATEST(s.raw, b.lo), b.hi) AS winsorized
    FROM scored s JOIN bounds b USING (source)
    """,
    "Per-source winsorization: clamp each document's raw score to its "
    "source's [p10, p90] (exact interpolated percentiles ≡ DuckDB "
    "quantile_cont) — the robust normalization step before mixing "
    "quality signals across sources with different scales. One "
    "groupBy for the bounds (tiny — one row per source) broadcast "
    "back onto the scan; at 100 TB swap the exact percentile for "
    "approx_percentile and nothing else changes.",
)
def s_winsorized_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("raw")
    )
    bounds = docs.groupBy("source").agg(
        F.round(F.expr("percentile(raw, 0.1)"), 6).alias("lo"),
        F.round(F.expr("percentile(raw, 0.9)"), 6).alias("hi"),
    )
    return docs.join(F.broadcast(bounds), "source").select(
        "doc_id",
        "source",
        "raw",
        F.least(F.greatest(F.col("raw"), F.col("lo")), F.col("hi")).alias("winsorized"),
    )
