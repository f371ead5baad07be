"""Thirteenth registry tranche: positional explode (UDTF shape with
ordinality), JSON→map-type operations, and multiset set operations
(INTERSECT ALL / EXCEPT ALL) — the remaining niches of the relational
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

from ..sources.parquet_tables import table
from .registry import register


@register(
    "tx_sentence_explode",
    r"""
    SELECT doc_id, pos, trim(v) AS sentence
    FROM (
        SELECT doc_id,
               unnest(string_split_regex(text, '\.')) AS v,
               unnest(range(0, len(string_split_regex(text, '\.')))) AS pos
        FROM documents
    )
    WHERE trim(v) <> ''
    """,
    "Positional sentence explode (posexplode — the UDTF shape with "
    "ordinality, P10 upgraded from set to ordered rows): one row per "
    "sentence with its 0-based position, empties dropped after "
    "splitting so positions stay stable. Pure generator expansion — "
    "no shuffle; the oracle reproduces ordinality with DuckDB's "
    "lock-step parallel unnest.",
)
def tx_sentence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), r"\.")).alias("pos", "v")
        )
        .filter(F.trim(F.col("v")) != "")
        .select("doc_id", "pos", F.trim(F.col("v")).alias("sentence"))
    )


@register(
    "p_map_entries",
    """
    SELECT k, COUNT(*) AS n_events,
           CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total_v
    FROM (
        SELECT unnest(json_keys(props)) AS k,
               json_extract_string(props, '$.' || unnest(json_keys(props))) AS v
        FROM events
    )
    GROUP BY k
    """,
    "Map-type operations: the raw JSON props column parsed into a real "
    "map<string,string> (from_json), exploded to (key, value) entries, "
    "rolled up per key. The map parse + explode happens inside the "
    "scan's projection; only |keys| groups shuffle.",
)
def p_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), MapType(StringType(), StringType()))
    return (
        ev.select(F.explode(m).alias("k", "v"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("total_v"),
        )
    )


@register(
    "e_multiset_priorities",
    """
    SELECT o_orderpriority, 'intersect_all' AS op FROM (
        SELECT o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-03-01'
    )
    UNION ALL
    SELECT o_orderpriority, 'except_all' AS op FROM (
        SELECT o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-03-01'
    )
    """,
    "Multiset set operations (table-granularity, duplicate-preserving — "
    "completing §2.8 beyond the array-level ops): January's order "
    "priorities INTERSECT ALL / EXCEPT ALL February's. Spark plans "
    "both as a single-shuffle aggregate on (value, side-counts) — "
    "min(l,r) and l-r multiplicities respectively.",
)
def e_multiset_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def month(lo: str, hi: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit(lo)))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit(hi)))
        ).select("o_orderpriority")

    # each month frame feeds BOTH set operations; unmaterialized, the
    # compiled plan re-ran the pushed-filter orders scan per consumer
    # (r12 scan census: 8 parquet scans). One skinny month-bounded
    # column each, checkpointed (guide §2.4).
    jan = month("1996-01-01", "1996-02-01").localCheckpoint(eager=False)
    feb = month("1996-02-01", "1996-03-01").localCheckpoint(eager=False)
    ia = jan.intersectAll(feb).withColumn("op", F.lit("intersect_all"))
    ea = jan.exceptAll(feb).withColumn("op", F.lit("except_all"))
    return ia.unionAll(ea)
