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
    """Some fixture generations store ``ts`` as TIMESTAMP(NANOS), which
    Spark's parquet reader rejects; others as TIMESTAMP(MICROS), which it
    reads natively. Handle both: read nanos as long (runtime-settable
    legacy conf) and floor-convert to microsecond TimestampType — the
    same truncation DuckDB applies, so differential results agree — and
    pass native timestamps through untouched."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """SQL entry point: expose every table as a temp view so users can
    run plain ``spark.sql`` against the warehouse (same Catalyst plans
    as the DataFrame API — one optimizer, two front ends)."""
    for n, df in tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
