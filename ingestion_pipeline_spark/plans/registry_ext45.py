"""Forty-fifth registry tranche: ML feature preparation.

- ``s_target_encoding`` — leave-one-out mean-target encoding of a
  categorical column: each row's category encoded as the mean target of
  the OTHER rows in its category, (Σy − y) / (n − 1). The standard
  high-cardinality-categorical feature for tabular models; LOO is the
  leakage-safe form (the row's own label never enters its feature —
  same discipline as the split-leakage audit, at row granularity).
  Exact decimal sums so the doubles hash-match.
- ``dq_median_impute`` — group-median imputation over a deterministic
  null pattern: the missing-value repair every feature pipeline needs,
  with the fill value computed per group (exact interpolated median,
  the ``t_price_percentiles`` machinery) and an imputed-flag column
  preserving the missingness signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register


@register(
    "s_target_encoding",
    """
    WITH g AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(o_totalprice AS DECIMAL(18,2)) AS y,
               SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_orderpriority) AS sum_y,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(sum_y - y AS DOUBLE) / (n - 1) AS loo_encoding
    FROM g WHERE n > 1
    """,
    "Leave-one-out target encoding: category feature = mean target of "
    "the category's OTHER rows, (Σy − y)/(n − 1) from one category-"
    "keyed window (per-group sums via a single shuffle, no join). LOO "
    "keeps the row's own label out of its feature — the row-level "
    "leakage guard. Decimal-exact sums make the encoded doubles "
    "hash-stable; at 100 TB add the standard prior-smoothing term — "
    "same window, one more broadcast scalar.",
)
def s_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    y = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.select(
        "o_orderkey",
        "o_orderpriority",
        y.alias("y"),
        F.sum(y).over(w).alias("sum_y"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") > 1)
    return g.select(
        "o_orderkey",
        "o_orderpriority",
        (
            (F.col("sum_y") - F.col("y")).cast("double") / (F.col("n") - 1)
        ).alias("loo_encoding"),
    )


@register(
    "dq_median_impute",
    """
    WITH src AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_totalprice END AS price
        FROM orders
    ),
    med AS (
        SELECT o_orderstatus,
               ROUND(quantile_cont(price, 0.5), 6) AS group_median
        FROM src GROUP BY o_orderstatus
    )
    SELECT s.o_orderkey, s.o_orderstatus,
           COALESCE(s.price, m.group_median) AS price_filled,
           CAST(s.price IS NULL AS INT) AS was_imputed
    FROM src s JOIN med m USING (o_orderstatus)
    """,
    "Group-median imputation: nulls (deterministic o_orderkey%7 "
    "pattern so the gate is reproducible) filled with the group's "
    "exact interpolated median (Spark percentile ≡ DuckDB "
    "quantile_cont, ignoring nulls on both engines), plus the "
    "was_imputed flag — missingness is signal, never silently erase "
    "it. One group aggregate broadcast back onto the scan; at 100 TB "
    "swap the exact median for approx_percentile, same plan shape.",
)
def dq_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    src = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    med = src.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(price, 0.5)"), 6).alias("group_median")
    )
    return src.join(F.broadcast(med), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce("price", "group_median").alias("price_filled"),
        F.col("price").isNull().cast("int").alias("was_imputed"),
    )
