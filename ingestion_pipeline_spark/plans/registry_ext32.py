"""Thirty-second registry tranche: global sequencing + shard layout —
the "write the training set" endgame of a corpus pipeline.

- ``t_global_dense_ids`` — dense contiguous 1..N ids in a total order
  WITHOUT a global sort. The naive ``row_number() OVER (ORDER BY ...)``
  collapses 100 TB onto one partition; the scale plan decomposes the
  total order (source, doc_id) into |groups| parallel per-source
  sorts plus a groups-sized prefix-sum offset table broadcast back.
  Same trick as zipWithIndex, expressed declaratively.
- ``pipeline_shard_manifest`` — fixed-capacity output shard assignment
  (50 docs/shard by global id) and the per-shard manifest (doc range,
  char totals) a training loader consumes. Composes on the dense ids.

Both value-hash-gated; the oracle IS the single-window formulation, so
the gate proves the decomposition ≡ the global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register

_SHARD_DOCS = 50


def _dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    # per-group counts -> prefix-sum offsets: a |groups|-sized table,
    # windowed on a single partition BY CONSTRUCTION (rows = distinct
    # sources, not corpus rows)
    offsets = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("source").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("source", "offset")
    )
    # the corpus-sized work: one window PER SOURCE GROUP (parallel
    # across groups, one shuffle on source) + a broadcast offset add
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("doc_id")
    )
    return (
        docs.withColumn("rn", rn)
        .join(F.broadcast(offsets), "source")
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.col("offset") + F.col("rn")).alias("global_id"),
        )
    )


@register(
    "t_global_dense_ids",
    """
    SELECT doc_id, source,
           ROW_NUMBER() OVER (ORDER BY source, doc_id) AS global_id
    FROM documents
    """,
    "Dense 1..N corpus numbering in (source, doc_id) order without a "
    "global sort: per-source parallel row_number (one shuffle, "
    "|groups| concurrent sorts) + a broadcast prefix-sum offset table "
    "(|groups| rows — its single-partition window is over sources, "
    "never corpus rows). The oracle is the one-window global sort, so "
    "the value hash proves decomposition ≡ total order. This is how "
    "stable training-document ids get assigned at 100 TB.",
)
def t_global_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dense_ids(spark, sf_dir).select("doc_id", "source", "global_id")


@register(
    "pipeline_shard_manifest",
    f"""
    WITH ids AS (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY source, doc_id) AS global_id
        FROM documents
    )
    SELECT (global_id - 1) // {_SHARD_DOCS} AS shard_id,
           COUNT(*) AS n_docs,
           MIN(global_id) AS first_id,
           MAX(global_id) AS last_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ids GROUP BY 1
    """,
    f"Training-shard layout: fixed {_SHARD_DOCS}-doc shards cut by "
    "dense global id, with the per-shard manifest (id range, char "
    "budget) a data loader reads instead of listing files. Composes "
    "the dense-id decomposition with one map-side-combined aggregate; "
    "shard boundaries are deterministic, so re-runs produce identical "
    "shards (resumable writes).",
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = _dense_ids(spark, sf_dir)
    return (
        ids.withColumn(
            "shard_id",
            ((F.col("global_id") - 1) / _SHARD_DOCS).cast("long"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("global_id").alias("first_id"),
            F.max("global_id").alias("last_id"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
