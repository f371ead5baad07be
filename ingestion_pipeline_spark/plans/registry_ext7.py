"""Eighth registry tranche: event-correlation (stream-stream) join and
sliding windows, verified in their batch incarnation.

Both builders live in ``streaming/joins.py`` / ``streaming/windows.py``
and are batch/stream agnostic — the oracle checks the batch plan's
values; ``tests/test_streaming_joins.py`` separately proves the same
code produces the same rows when run as a watermarked streaming query
over a file-source stream (Kafka emulation, SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import exact_sum
from ..sources.parquet_tables import table
from ..streaming.joins import clicks_to_purchases
from .registry import register


@register(
    "w_click_purchase_attribution",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           p.value AS purchase_value,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES
    """,
    "Funnel attribution: every purchase matched to the same user's "
    "clicks in the preceding 30 minutes (streaming/joins.py "
    "interval_join). In streaming mode the identical plan is a "
    "watermarked stream-stream join whose state is bounded by "
    "watermark+interval; in batch it is an equi join on user_id with a "
    "residual time-range predicate — the equi key keeps it a hash join, "
    "never a nested loop.",
)
def w_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clicks_to_purchases(table(spark, sf_dir, "events"))


@register(
    "w_sliding_window_counts",
    """
    SELECT epoch_us(time_bucket(INTERVAL '15 minutes', ts)
                    - INTERVAL (k * 15) MINUTE) AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN range(0, 4) t(k)
    GROUP BY 1, 2
    """,
    "Sliding windows (1 hour long, 15 minute slide): every event lands "
    "in exactly 4 overlapping windows. Spark's window() expands rows "
    "4x before the partial aggregate — the shuffle still carries only "
    "|windows × keys| rows after map-side combine. The oracle "
    "reproduces the expansion with an explicit 0..3 offset cross join.",
)
def w_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
