"""Forty-fourth registry tranche: native VARIANT semi-structured type.

``p_variant_extraction`` — the reference's warehouse column IS a
Snowflake VARIANT (``processor.py:55-62`` stores ``PARSE_JSON(raw)``),
and Spark 4 has the native counterpart: ``parse_json`` → VariantType,
``variant_get``/``try_variant_get`` typed path extraction. This gate
runs the events ``props`` JSON through the REAL variant path — parse
once into the binary-encoded variant, typed extraction with never-throw
defaults (P1 semantics: ``try_variant_get`` on a missing path is NULL,
coalesced) — and aggregates. The oracle extracts the same paths from
the raw JSON text, so the differential proves variant encode/decode is
value-transparent.

Vs ``get_json_object`` (p_props_extraction): the variant is parsed ONCE
per row into a binary tree; each subsequent path access is a tree walk,
not a re-parse — the right storage layout when a 100 TB warehouse
column is read by many different projections (exactly Snowflake's
VARIANT pitch, now native to Spark + parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import spread
from ..sources.parquet_tables import table
from .registry import register


@register(
    "p_variant_extraction",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(COALESCE(json_extract_string(props, '$.k'), '0')
                         AS DECIMAL(18,2))) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                      THEN 1 END) AS n_defaulted
    FROM events
    GROUP BY event_type
    """,
    "Native VARIANT warehouse column (K1 reference parity — Snowflake "
    "PARSE_JSON, processor.py:55-62): props parsed ONCE into Spark 4's "
    "binary variant encoding, typed try_variant_get path extraction "
    "with never-throw defaults (P1), aggregated per event type. The "
    "oracle re-derives the values from the raw JSON text, proving the "
    "variant encode/decode value-transparent. At 100 TB, parse-once "
    "binary variants beat per-projection get_json_object re-parsing "
    "whenever multiple readers project different paths.",
)
def p_variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(table(spark, sf_dir, "events"))
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.coalesce(
        F.try_variant_get("v", "$.k", "long"), F.lit(0).cast("long")
    )
    missing = F.try_variant_get("v", "$.missing", "string")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.count(F.when(missing.isNull(), 1)).alias("n_defaulted"),
    )
