"""Twenty-seventh registry tranche: data-quality gating + monitoring.

- ``dq_orders_expectations``: the Deequ/DLT-shaped constraint report —
  N declarative rules checked in ONE map-side-combined aggregate over
  one scan (never a scan per rule). Includes a rule that genuinely
  fails (totalprice ≤ 300k has ~6k violations at sf0.01) so the report
  demonstrably reports, not rubber-stamps.
- ``w_zscore_anomalies``: rolling z-score anomaly flags over each
  user's trailing 20 events — the monitoring counterpart: mean and
  variance are derived from EXACT decimal window sums (value and
  value² accumulate as decimals; only the final mean/σ math is
  float), so the float results are order-independent and hash-match
  the oracle. One shuffle on the window key, the w_moving_avg cost
  envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.quality import expectation_report
from ..sources.parquet_tables import table
from .registry import register

_RULE_SQL = """
    SELECT '{name}' AS rule,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CASE WHEN COUNT(*) = 0 THEN 1.0
                ELSE (COUNT(*) - SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 END))
                     / CAST(COUNT(*) AS DOUBLE) END AS pass_fraction,
           SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) = 0 AS ok
    FROM orders
"""

_RULES_SQL = {
    "totalprice_positive": "o_totalprice > 0",
    "orderdate_not_null": "o_orderdate IS NOT NULL",
    "status_in_domain": "o_orderstatus IN ('O', 'F', 'P')",
    # regexp_matches = partial match, parity with Spark rlike (DuckDB's
    # ~ operator is a FULL-match alias and would fail every row)
    "priority_format": "regexp_matches(o_orderpriority, '^[1-5]-')",
    "totalprice_under_300k": "o_totalprice <= 300000",
}


@register(
    "dq_orders_expectations",
    " UNION ALL ".join(
        _RULE_SQL.format(name=n, pred=p) for n, p in _RULES_SQL.items()
    ),
    "Data-quality expectation report (Deequ/DLT shape): 5 declarative "
    "rules — positivity, null guard, domain membership, format regex, "
    "range bound (the last fails on ~12% of rows, proving the report "
    "reports) — evaluated as ONE aggregate over ONE scan: each rule is "
    "a sum(violated) term with map-side combine, so rule count never "
    "multiplies scan cost. NULL predicates count as violations "
    "(coalesce(pred, false)), closing SQL's three-valued-logic "
    "loophole. Row-level enforcement is "
    "operators/quality.py:split_by_expectations -> W7 quarantine.",
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    rules = {
        "totalprice_positive": F.col("o_totalprice") > 0,
        "orderdate_not_null": F.col("o_orderdate").isNotNull(),
        "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
        "totalprice_under_300k": F.col("o_totalprice") <= 300000,
    }
    return expectation_report(orders, rules)


@register(
    "w_zscore_anomalies",
    """
    WITH stats AS (
        SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
               COUNT(*) OVER w AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE) AS ss
        FROM events
        WHERE user_id < 200
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, value,
           ROUND((value - s / cnt)
                 / sqrt((ss - s * s / cnt) / (cnt - 1)), 6) AS z
    FROM stats
    WHERE cnt >= 10
      AND abs((value - s / cnt)
              / sqrt((ss - s * s / cnt) / (cnt - 1))) > 3.0
    """,
    "Rolling z-score anomaly detection: each event scored against its "
    "user's trailing-20 mean/σ; |z| > 3 rows surface. Mean and "
    "variance come from EXACT decimal window sums (Σv, Σv² as "
    "DECIMAL), so the only float math is the final scalar formula — "
    "order-independent, hash-stable, and one shuffle on the entity "
    "key. The monitoring-side sibling of the w_moving_avg family; at "
    "100 TB the same expression runs in Structured Streaming over "
    "applyInPandasWithState or a watermarked window.",
)
def w_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    dec = F.col("value").cast("decimal(14,2)")
    cnt = F.count(F.lit(1)).over(w)
    s = F.sum(dec).over(w).cast("double")
    ss = F.sum(dec * dec).over(w).cast("double")
    val = F.col("value").cast("double")
    z = (val - s / cnt) / F.sqrt((ss - s * s / cnt) / (cnt - 1))
    return (
        ev.select(
            "user_id",
            "event_id",
            val.alias("value"),
            cnt.alias("cnt"),
            z.alias("__z"),
        )
        .filter((F.col("cnt") >= 10) & (F.abs("__z") > 3.0))
        .select("user_id", "event_id", "value", F.round("__z", 6).alias("z"))
    )
