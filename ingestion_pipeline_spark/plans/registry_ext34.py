"""Thirty-fourth registry tranche: point-in-time (temporal) enrichment.

``j_point_in_time_enrich`` — join facts to the dimension state that was
valid AT the fact's event time: purchases enriched with the user's last
non-purchase activity state, where states are SCD2 validity intervals
(the ``w_scd2_user_state`` builder shape) and the join predicate is
``equi(user_id) AND valid_from <= ts < valid_to``. This is the lookup
every feature-store / training-label pipeline needs to avoid leakage:
enrich each example with what was known AT event time, never after.

Plan shape: an equi sort-merge join on the entity key with the interval
containment as residual filter — per-key state lists are bounded (one
row per state change), so the residual scan is short however big the
fact side; the as-of union+window trick (operators/relational.py:
asof_join) is the alternative when states-per-key grow pathological.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register


@register(
    "j_point_in_time_enrich",
    """
    WITH st AS (
        SELECT user_id, event_type AS state_type,
               epoch_us(ts) AS valid_from_us,
               COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id),
                        -1) AS valid_to_us
        FROM events
        WHERE user_id < 100 AND event_type <> 'purchase'
    ),
    p AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us
        FROM events
        WHERE user_id < 100 AND event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id, p.ts_us,
           COALESCE(st.state_type, 'none') AS state_type,
           COALESCE(st.valid_from_us, -1) AS state_since_us
    FROM p LEFT JOIN st
      ON p.user_id = st.user_id
     AND p.ts_us >= st.valid_from_us
     AND (st.valid_to_us = -1 OR p.ts_us < st.valid_to_us)
    """,
    "Point-in-time enrichment (leakage-safe feature lookup): each "
    "purchase joins the SCD2 state interval containing its event time "
    "— equi on user_id, interval containment as residual, LEFT so "
    "pre-state facts survive with a 'none' sentinel. Intervals are "
    "half-open and non-overlapping by construction (lead over one "
    "keyed window), so the match is unique without dedup. One shuffle "
    "per side on the entity key; per-key interval lists stay bounded "
    "at any corpus size.",
)
def j_point_in_time_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    st = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.col("event_type").alias("state_type"),
            F.unix_micros("ts").alias("valid_from_us"),
            "ts",
            "event_id",
        )
        .withColumn(
            "valid_to_us",
            F.coalesce(
                F.lead(F.unix_micros("ts")).over(
                    Window.partitionBy("user_id").orderBy("ts", "event_id")
                ),
                F.lit(-1),
            ),
        )
        .select("user_id", "state_type", "valid_from_us", "valid_to_us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    joined = p.join(
        st,
        (p.user_id == st.user_id)
        & (p.ts_us >= st.valid_from_us)
        & ((st.valid_to_us == -1) | (p.ts_us < st.valid_to_us)),
        "left",
    )
    return joined.select(
        p.user_id,
        "event_id",
        "ts_us",
        F.coalesce(st.state_type, F.lit("none")).alias("state_type"),
        F.coalesce(st.valid_from_us, F.lit(-1)).alias("state_since_us"),
    )
