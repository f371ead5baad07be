"""Stream-stream and stream-static join builders (capability beyond the
reference — its only join-shaped ops are driver-side dict lookups,
SURVEY §2.5; a real ingest pipeline needs correlated-event joins).

Every builder is batch/stream agnostic: under ``readStream`` Spark
plans a watermarked state-store join (each side buffers only rows
inside the watermark + interval bound — bounded state at any scale);
in batch the identical code is an ordinary range-predicate join, which
is what the DuckDB oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 30 MINUTES",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Equi-key join constrained to ``left_ts - lower <= right_ts <=
    left_ts + upper`` — the event-correlation join (click→purchase,
    request→response). Streaming: both sides MUST carry watermarks and
    the time bound makes state evictable; Spark buffers each side only
    within [watermark, interval] — state is O(rate × interval), not
    O(history). Batch: same plan minus state. Column names must be
    disjoint across the two sides (rename before calling).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.expr(f"{left_ts} - {lower}"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + {upper}"))
    )
    return left.join(right, cond, how)


def clicks_to_purchases(
    events: DataFrame,
    max_gap: str = "INTERVAL 30 MINUTES",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Attribute every purchase to the clicks of the same user in the
    preceding ``max_gap`` — the canonical funnel/attribution join, built
    from one events source split into two streams. Output: one row per
    (click, purchase) correlation with the gap in seconds.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = interval_join(
        clicks,
        purchases,
        "user_id",
        "r_user_id",
        lower="INTERVAL 0 SECONDS",
        upper=max_gap,
        watermark=watermark,
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.col("purchase_value"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("gap_us"),
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-per-key delivery repair: drop re-deliveries of the
    same key arriving within the watermark horizon. Unlike plain
    ``dropDuplicates``, state is evicted once the watermark passes —
    bounded memory under unbounded streams (the at-least-once Kafka
    replay in the reference, SURVEY §2.11 W2, needs exactly this to
    upgrade to effectively-once). Batch: falls back to dropDuplicates.
    """
    if stream.isStreaming:
        return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)
