"""Sixteenth registry tranche: skew-mitigation shapes under the oracle
gate — the salted transforms of ``operators/skew.py`` proven
result-identical to their unsalted SQL forms.

The oracles are deliberately the PLAIN queries (no salt anywhere): the
whole point of salting is that it changes the physical distribution and
nothing else, so a value-hash match against the unsalted SQL is the
strongest possible statement of correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents_disc_price, sum_cents
from ..operators.skew import salted_collect_list, salted_join
from ..sources.parquet_tables import table
from .registry import SQL_DISC, SQL_EXT, register


@register(
    "j_salted_brand_revenue",
    f"""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM({SQL_EXT} * {SQL_DISC}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    "Salted fact-to-dim join (operators/skew.py:salted_join): lineitem "
    "is salted on pmod(xxhash64(orderkey,linenumber), 8) and part is "
    "replicated 8x, so a hot part key spreads over 8 reducer tasks. The "
    "oracle is the UNSALTED join — the salt must change distribution "
    "and nothing else. The manual path exists for plans AQE skew-split "
    "can't fix (join feeding a same-key window); note a broadcastable "
    "dim needs no salting at all.",
)
def j_salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(
        li,
        part,
        "l_partkey",
        salt_from=F.struct("l_orderkey", "l_linenumber"),
        n_salts=8,
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_lines"),
        sum_cents(cents_disc_price(), "revenue", 4),
    )


@register(
    "g_salted_collect_docs",
    """
    SELECT lang,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM documents
    GROUP BY lang
    """,
    "Two-stage salted collect_list (operators/skew.py): collect has no "
    "map-side partial aggregation, so one hot group funnels through one "
    "reducer — stage 1 collects per (group, salt) bounding task state "
    "to |group|/8, stage 2 flattens. Oracle is the plain single-stage "
    "collect, order-normalized.",
)
def g_salted_collect_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("lang", "doc_id")
    out = salted_collect_list(
        docs, ["lang"], "doc_id", salt_from=F.col("doc_id"), n_salts=8
    )
    return out.select("lang", F.concat_ws(",", F.col("values")).alias("doc_ids"))
