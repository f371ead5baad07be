"""Thirty-seventh registry tranche: exact-arithmetic statistics.

``g_value_trend`` — per-group least-squares trend (slope, intercept)
and Pearson correlation of event value against time, computed from
EXACT decimal/integer power sums (n, Σx, Σy, Σxy, Σx², Σy²) instead of
the engines' native ``corr``/``regr_slope`` — those run streaming
Welford updates whose float results depend on accumulation order and
can never hash-match across engines (or even across partitionings).
The closed-form-from-sums formulation is the distributed-statistics
discipline this repo uses everywhere (functions/exact.py): the sums
merge exactly like any partial aggregate, and the final doubles are
pure functions of exact inputs — bit-identical anywhere.

x = hours since the corpus epoch (integer micros scaled in exact
space), y = event value (2dp decimal). One scan, map-side combine,
|groups| result rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 UTC, the fixture epoch


@register(
    "g_value_trend",
    f"""
    WITH s AS (
        SELECT event_type,
               CAST(ROUND(CAST(epoch_us(ts) - {_EPOCH_US} AS DOUBLE)
                          / CAST(3600000000 AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ),
    sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM s GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept,
           (n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
    FROM sums
    """,
    "Per-group least-squares trend + Pearson correlation of value vs "
    "time, from exact decimal power sums (n, Σx, Σy, Σxy, Σx², Σy²) — "
    "NOT the engines' native corr/regr_*, whose streaming float "
    "updates are accumulation-order-dependent and can't hash-match "
    "across engines or partitionings. The sums merge like any partial "
    "aggregate (one scan, map-side combine, |groups| rows out) and the "
    "closed-form doubles are bit-identical everywhere — the "
    "distributed-statistics discipline at any scale.",
)
def g_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # x must stay DECIMAL into the power sums: the round-2 advisor showed
    # `decimal / double-literal` silently coerces to DOUBLE in Spark,
    # making Σx/Σxy/Σxx partition-order-dependent float accumulations.
    # Per-row double divide + round(6) + cast to decimal(18,6) is
    # order-independent (row-local, IEEE-identical in both engines), and
    # the SUMs then accumulate exactly. decimal(18,6) (not 38) keeps
    # x*x / x*y products inside both engines' 38-digit width.
    x = F.round(
        (F.unix_micros("ts") - F.lit(_EPOCH_US)).cast("double")
        / F.lit(3600000000.0),
        6,
    ).cast("decimal(18,6)")
    y = F.col("value").cast("decimal(18,2)")
    s = ev.select("event_type", x.alias("x"), y.alias("y"))
    sums = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr"),
    )
