"""Thirty-sixth registry tranche: irregular-time-series statistics.

``w_time_weighted_avg`` — the hypertable ``time_weight`` shape: a plain
AVG over irregularly-sampled readings is biased toward bursts; the
unbiased state summary weights each reading by how long it was current
(LOCF — last observation carried forward — until the next reading).
One lead window per entity + exact-decimal weighted sums, so the
doubles hash-match the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register


@register(
    "w_time_weighted_avg",
    """
    WITH s AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,2)) AS v,
               lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS observed_us,
           CAST(SUM(v * dt_us) AS DOUBLE) / SUM(dt_us) AS tw_avg,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) AS plain_avg
    FROM s WHERE dt_us IS NOT NULL AND dt_us > 0
    GROUP BY user_id
    """,
    "Time-weighted average (LOCF) per entity over irregular samples — "
    "each reading weighted by its holding interval (lead window), the "
    "unbiased state summary where plain AVG over-counts bursts (both "
    "emitted so the bias is visible). Weighted sums run in exact "
    "decimal x integer-microsecond space (functions.exact discipline), "
    "so the final doubles are order-independent and hash-stable. One "
    "entity-key shuffle, the standard w_* envelope; at 100 TB compose "
    "with the gap-fill spine (w_gapfill_hourly) for bounded intervals "
    "across partition boundaries.",
)
def w_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "value", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").alias("observed_us"),
        (
            F.sum(F.col("v") * F.col("dt_us")).cast("double")
            / F.sum("dt_us")
        ).alias("tw_avg"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("plain_avg"),
    )
