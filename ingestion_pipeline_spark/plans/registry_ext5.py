"""Sixth registry tranche: quantified subqueries (Q20 IN-with-HAVING,
Q21 EXISTS/NOT-EXISTS, Q22 scalar-avg + NOT-EXISTS), pivot /
grouping-sets reshaping, the full rank-function family, and an
inequality (band range) join.

The reference never needs any of these — its only joins are single-key
equi lookups (SURVEY §2.5) — but they complete the relational surface a
user migrating real analytics onto this engine expects, and each one
exercises a distinct Catalyst decorrelation / physical-join path:
left-semi with pre-aggregated HAVING (Q20), left-semi + left-anti with
residual inequality predicates (Q21), broadcast scalar + anti-join
(Q22), pivot partial aggregation, expand-based grouping sets, window
rank functions, and broadcast nested-loop for the band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import cents_disc_price, dec, money
from ..sources.parquet_tables import table
from .registry import SQL_DISC, SQL_EXT, _disc_price, register


@register(
    "q20_heavy_suppliers",
    """
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 2500
    )
    """,
    "TPC-H Q20 shape: IN against an aggregated-with-HAVING subquery "
    "(suppliers who shipped >2500 units in 1996; the fixture has no "
    "partsupp, so availability is total shipped quantity). Spark: "
    "aggregate lineitem per supplier (map-side partials make the shuffle "
    "|suppliers| rows), filter, then broadcast left-semi join into the "
    "supplier dimension. Quantity sums compare in exact decimal space.",
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    qualified = (
        li.groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(2500).cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(qualified), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


@register(
    "q21_sole_blocking_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    "TPC-H Q21 shape: the only supplier whose lines were returned on a "
    "finished multi-supplier order (l_returnflag='R' stands in for the "
    "missing receipt/commit dates). The oracle keeps the literal "
    "EXISTS / NOT EXISTS form; the Spark plan uses the aggregate "
    "rewrite — per order, count distinct suppliers and distinct "
    "R-flag suppliers, then a row qualifies iff the order has >1 "
    "supplier and exactly one R-supplier (necessarily l1's own, since "
    "l1 itself has flag R). One aggregation pass + one co-partitioned "
    "join instead of semi+anti self-joins: lineitem is shuffled twice "
    "on l_orderkey (and AQE coalesces the exchanges) rather than three "
    "times, which at 100 TB is the difference between 2 and 3 "
    "fact-table shuffles.",
)
def q21_sole_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # collect_set (not count_distinct x2): two distinct aggregates would
    # plan an Expand that doubles every lineitem row before the shuffle;
    # per-order supplier sets are tiny and merge map-side.
    per_order = li.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey")))
        ).alias("n_r_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").join(
        orders_f, F.col("o_orderkey") == F.col("l_orderkey")
    )
    sole = l1.join(
        per_order, F.col("g_orderkey") == F.col("l_orderkey")
    ).filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_rich_quiet_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                       FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22 shape: above-average-balance customers with no urgent "
    "orders (every fixture customer has orders, so the anti condition is "
    "urgency; c_mktsegment stands in for the phone country code). The "
    "scalar average is sum(decimal)/count evaluated once in double — a "
    "broadcast scalar; NOT EXISTS is a left-anti join against the "
    "pre-filtered urgent-orders projection.",
)
def q22_rich_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "avg_bal"
        )
    )
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "g_pivot_returnflag",
    f"""
    SELECT l_linestatus,
           CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN {SQL_EXT} * {SQL_DISC} END), 0) AS DOUBLE) AS A,
           CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN {SQL_EXT} * {SQL_DISC} END), 0) AS DOUBLE) AS N,
           CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN {SQL_EXT} * {SQL_DISC} END), 0) AS DOUBLE) AS R
    FROM lineitem
    GROUP BY l_linestatus
    """,
    "Pivot (wide reshape): discounted revenue by linestatus × returnflag "
    "with the returnflag domain pivoted into columns. Spark's "
    "pivot-with-explicit-values runs as an ordinary two-phase hash "
    "aggregate (one accumulator per pivot value) — one shuffle of "
    "|groups| rows; the explicit value list keeps the plan static "
    "(no driver-side distinct pre-pass).",
)
def g_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg((F.sum(cents_disc_price()) / F.lit(10000.0)).alias("v"))
        .na.fill(0.0, ["A", "N", "R"])
    )


@register(
    "g_grouping_sets_revenue",
    f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "Explicit GROUPING SETS (finer than cube/rollup, both already "
    "covered): detail, per-flag, and grand-total levels in one pass with "
    "GROUPING() provenance flags. Spark plans this as a single Expand + "
    "hash aggregate — the fact table is read once, and map-side partials "
    "keep the shuffle at |groups|·|sets| rows.",
)
def g_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem_view")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_lines
        FROM gs_lineitem_view
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "w_rank_family",
    """
    SELECT o_orderkey, o_orderpriority,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cd
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-03-01' AND o_orderdate < TIMESTAMP '1996-04-01'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "The full rank-function family (rank, dense_rank, percent_rank, "
    "ntile, cume_dist) in one window. The ORDER BY includes the unique "
    "o_orderkey so ntile — which is order-sensitive within ties — is "
    "deterministic. percent_rank/cume_dist are exact small-integer "
    "ratios, identical in IEEE double on both engines. One shuffle on "
    "the partition key; all five functions evaluate in a single window "
    "operator pass.",
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-03-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).cast("double").alias("prnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.cume_dist().over(w).cast("double").alias("cd"),
    )


@register(
    "j_price_band_join",
    """
    SELECT band_id, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS band_value
    FROM orders
    JOIN (VALUES (0, 0.0, 50000.0), (1, 50000.0, 100000.0), (2, 100000.0, 200000.0),
                 (3, 200000.0, 300000.0), (4, 300000.0, 400000.0), (5, 400000.0, 1000000000.0))
         AS bands(band_id, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_id
    """,
    "Inequality (range/band) join: orders matched to price bands on "
    "lo <= price < hi — a join shape the reference never has (its joins "
    "are all single-key equi, SURVEY §2.5). The band side is rows-scale "
    "tiny, so Spark executes a broadcast nested-loop join: each task "
    "streams its orders partition against 6 in-memory bands — no "
    "shuffle of the fact side at any scale.",
)
def j_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = spark.createDataFrame(
        [
            (0, 0.0, 50_000.0),
            (1, 50_000.0, 100_000.0),
            (2, 100_000.0, 200_000.0),
            (3, 200_000.0, 300_000.0),
            (4, 300_000.0, 400_000.0),
            (5, 400_000.0, 1_000_000_000.0),
        ],
        "band_id int, lo double, hi double",
    )
    orders = table(spark, sf_dir, "orders").select("o_totalprice")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("band_value"),
        )
    )
