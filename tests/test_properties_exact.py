"""Property tests for functions/exact.py — the exact-arithmetic module
every money aggregate in the registry routes through (SURVEY §5 item 5).

The module's contract: distributed sums of 2-decimal money doubles are
bit-identical to a Python ``decimal.Decimal`` reference, REGARDLESS of
partitioning, on both exact paths (decimal space and integer-cents
space). Hypothesis generates the values; each aggregate is evaluated
under several partition layouts and compared to the Decimal oracle
exactly (==, no tolerance) — the same guarantee the DuckDB differential
relies on, here isolated to the primitive.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ingestion_pipeline_spark.functions.exact import (
    cents,
    exact_avg,
    exact_sum,
    one_minus,
    one_plus,
    sum_cents,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2-decimal money values as the fixtures store them: exact cents / 100.
# Bounded at 1e9 dollars — far above any fixture value, inside the
# documented recovery range of floor(x*100 + 0.5).
money_st = st.integers(min_value=0, max_value=10**11).map(lambda c: c / 100)
# 2-decimal rates in [0, 1) — the l_discount / l_tax shape.
rate_st = st.integers(min_value=0, max_value=99).map(lambda c: c / 100)

LAYOUTS = (1, 3, 7)


def _money_df(spark, values, n_parts):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    return df.repartition(n_parts)


@given(values=st.lists(money_st, min_size=1, max_size=30))
@SLOW
def test_exact_sum_matches_decimal_under_any_layout(spark, values):
    """exact_sum == float(Decimal sum) exactly, for every layout."""
    want = float(sum(Decimal(f"{v:.2f}") for v in values))
    for n in LAYOUTS:
        got = _money_df(spark, values, n).agg(exact_sum("v", "s")).collect()[0]["s"]
        assert got == want, (got, want, n)


@given(values=st.lists(money_st, min_size=1, max_size=30))
@SLOW
def test_exact_avg_matches_decimal_under_any_layout(spark, values):
    """exact_avg divides the exact Decimal sum once — bit-identical."""
    want = float(sum(Decimal(f"{v:.2f}") for v in values)) / len(values)
    for n in LAYOUTS:
        got = _money_df(spark, values, n).agg(exact_avg("v", "a")).collect()[0]["a"]
        assert got == want, (got, want, n)


@given(value=money_st)
@SLOW
def test_cents_recovers_integer_exactly(spark, value):
    """cents(x) recovers the stored integer cents for any 2-decimal x."""
    want = round(Decimal(f"{value:.2f}") * 100)
    got = (
        spark.createDataFrame([(float(value),)], "v double")
        .select(cents("v").alias("c"))
        .collect()[0]["c"]
    )
    assert got == want, (got, want, value)


@given(
    rows=st.lists(st.tuples(money_st, rate_st), min_size=1, max_size=30),
)
@SLOW
def test_cents_revenue_matches_decimal_path_and_oracle(spark, rows):
    """price*(1-disc) summed in integer-cents space == decimal space ==
    Decimal reference, under every layout (the q3/q5/q10 revenue term)."""
    want = float(
        sum(Decimal(f"{p:.2f}") * (1 - Decimal(f"{d:.2f}")) for p, d in rows)
    )
    for n in LAYOUTS:
        df = spark.createDataFrame(
            [(float(p), float(d)) for p, d in rows], "price double, disc double"
        ).repartition(n)
        got_cents = df.agg(
            sum_cents(cents("price") * (F.lit(100) - cents("disc")), "r")
        ).collect()[0]["r"]
        got_dec = df.agg(
            F.sum(
                F.col("price").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(4,2)") - F.col("disc").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("r")
        ).collect()[0]["r"]
        assert got_cents == want, (got_cents, want, n)
        assert got_dec == want, (got_dec, want, n)


@given(rate=rate_st)
@SLOW
def test_one_minus_one_plus_exact(spark, rate):
    """(1±rate) stay exact 2-decimal values (no double residue)."""
    row = (
        spark.createDataFrame([(float(rate),)], "r double")
        .select(
            one_minus("r").cast("double").alias("m"),
            one_plus("r").cast("double").alias("p"),
        )
        .collect()[0]
    )
    assert row["m"] == float(1 - Decimal(f"{rate:.2f}"))
    assert row["p"] == float(1 + Decimal(f"{rate:.2f}"))
