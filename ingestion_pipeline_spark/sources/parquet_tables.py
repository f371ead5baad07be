"""Parquet table source (the engine's warehouse scan).

The reference lands every record row-at-a-time into Snowflake
(``processor.py:55-59``); our warehouse is columnar parquet read through
Spark's vectorized reader, so predicate pushdown / column pruning /
partition pruning come from Catalyst for free.

At 100 TB the same API reads a *directory* per table (thousands of files,
ideally partitioned by a date column, e.g. ``datePublished`` month for CVE
tables so date-range filters prune — SURVEY §2.4 F6). The test fixtures
are single files per table; nothing here assumes that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. ``sf_dir`` is a directory holding ``<name>.parquet``
    (a file locally; a partitioned directory at scale — the glob is the
    same)."""
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture generations differ in how they store ``ts``:

    - TIMESTAMP(NANOS): Spark's reader rejects it outright → read nanos
      as long (legacy conf) and floor-convert to microsecond
      TimestampType, the same truncation DuckDB applies.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TimestampNTZType (``spark.sql.parquet.inferTimestampNTZ.enabled``
      defaults true), but the whole time-family API here
      (``unix_micros``, ``window``, stream watermarks) needs
      session-local TIMESTAMP → cast NTZ to TimestampType. The session
      timezone is pinned to UTC (session.py), so the wall-clock values
      are identical to DuckDB's naive timestamps.
    - TIMESTAMP(MICROS, adjusted): already TimestampType, pass through.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """SQL entry point: expose every table as a temp view so users can
    run plain ``spark.sql`` against the warehouse (same Catalyst plans
    as the DataFrame API — one optimizer, two front ends)."""
    for n, df in tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
