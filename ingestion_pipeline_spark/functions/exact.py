"""Exact (order-independent) numeric aggregation helpers.

Distributed sums of doubles are non-deterministic across partitionings
(floating-point addition is not associative), which breaks differential
testing against any oracle and makes production metrics drift run-to-run.
The fixture money columns are exact 2-decimal values, so we aggregate in
DECIMAL space — exact, associative, identical on every engine — and cast
the final result back to DOUBLE.

At 100 TB this is also the *fast* path: Spark's hash aggregate on decimals
stays inside whole-stage codegen / Tungsten; there is no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
HI = "decimal(30,6)"


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def exact_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """SUM as decimal, returned as double: associative → deterministic."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def exact_avg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """AVG = exact decimal sum / count, divided in double precision.

    Division happens once, on two deterministic operands, so the double
    result is identical regardless of partitioning or engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).alias(alias)


def money(col: Column | str) -> Column:
    """A 2-decimal money column as exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def one_minus(col: Column | str) -> Column:
    """(1 - rate) as exact decimal — for discount multipliers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1).cast("decimal(4,2)") - c.cast("decimal(4,2)")


def one_plus(col: Column | str) -> Column:
    """(1 + rate) as exact decimal — for tax multipliers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1).cast("decimal(4,2)") + c.cast("decimal(4,2)")


def round_dec(col: Column, scale: int = 6) -> Column:
    """Round a double expression and cast to decimal for exact summation.

    Use for per-row *derived* values (products of money columns): the
    per-row double arithmetic is deterministic (IEEE 754, same expression
    shape on every engine); quantizing to decimal afterwards makes the
    subsequent SUM associative."""
    return F.round(col, scale).cast(f"decimal(30,{scale})")
