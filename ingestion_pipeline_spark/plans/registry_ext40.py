"""Fortieth registry tranche: distribution-drift monitoring (PSI).

``dq_psi_drift`` — population stability index between two corpus
slices: bin the metric on the REFERENCE slice's equal-width grid,
compare bin shares, PSI = Σ (p−q)·ln(p/q). The standard
"did this week's data shift?" gate on ingest (PSI < 0.1 stable,
0.1–0.25 drifting, > 0.25 shifted).

Float discipline worth naming: the per-bin PSI terms involve logs, so
the TOTAL is a sum of irrational doubles — naive SUM() accumulates in
partition order and cannot hash-match across engines. Both sides here
sum via the sorted-fold trick (collect the ≤|bins| terms, sort, fold
left-to-right), making the total bit-deterministic — the same
fixed-order-summation discipline as BM25/RRF, applied to a tiny
aggregate. Per-bin rows are emitted too, so the gate checks the whole
distribution, not just the scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register

_BINS = 10
_EPS = 1e-6  # standard PSI zero-share guard


@register(
    "dq_psi_drift",
    f"""
    WITH src AS (
        SELECT o_totalprice AS x, o_orderkey % 2 AS slice FROM orders
    ),
    b AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM src WHERE slice = 0),
    binned AS (
        SELECT slice,
               LEAST(GREATEST(CAST(FLOOR((x - lo) * {_BINS} / (hi - lo))
                                   AS BIGINT), 0), {_BINS - 1}) AS bin_idx
        FROM src, b
    ),
    counts AS (
        SELECT bin_idx,
               COUNT(CASE WHEN slice = 0 THEN 1 END) AS n_ref,
               COUNT(CASE WHEN slice = 1 THEN 1 END) AS n_cur
        FROM binned GROUP BY bin_idx
    ),
    tot AS (
        SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr,
               CAST(SUM(n_cur) AS DOUBLE) AS tc FROM counts
    ),
    terms AS (
        SELECT bin_idx, n_ref, n_cur,
               (GREATEST(n_ref / tr, {_EPS}) - GREATEST(n_cur / tc, {_EPS}))
                   * ln(GREATEST(n_ref / tr, {_EPS})
                        / GREATEST(n_cur / tc, {_EPS})) AS psi_term
        FROM counts, tot
    )
    SELECT bin_idx, n_ref, n_cur, psi_term,
           (SELECT list_aggregate(list_sort(list(psi_term)), 'sum')
            FROM terms) AS psi_total
    FROM terms
    """,
    "Population stability index between the even/odd order slices: "
    "bins fixed on the REFERENCE slice's min/max grid (1-row "
    "broadcast), bin shares with the standard epsilon guard, "
    "per-bin PSI terms plus the total. The total is summed via "
    "sorted-fold (collect ≤|bins| terms → sort → left-to-right fold) "
    "on BOTH engines, so the log-double sum is bit-deterministic — "
    "the fixed-order float-summation discipline made explicit. One "
    "scan + a |bins|-row aggregate: the cheapest possible drift gate "
    "on 100 TB of daily ingest.",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderkey") % 2).alias("slice"),
    )
    bounds = src.filter(F.col("slice") == 0).agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    binned = src.crossJoin(F.broadcast(bounds)).select(
        "slice",
        F.least(
            F.greatest(
                F.floor((F.col("x") - F.col("lo")) * _BINS / span),
                F.lit(0).cast("long"),
            ),
            F.lit(_BINS - 1).cast("long"),
        ).alias("bin_idx"),
    )
    # ≤ _BINS rows, consumed by totals + terms + (via terms) the final
    # fold: without a materialization the compiled plan re-executed the
    # full orders scan/bin pipeline per branch (r12 scan census: 8
    # parquet scans in ONE query). Checkpointing the bounded histogram
    # collapses that to the two inherent scans (bounds + binning pass).
    counts = (
        binned.groupBy("bin_idx")
        .agg(
            F.count(F.when(F.col("slice") == 0, 1)).alias("n_ref"),
            F.count(F.when(F.col("slice") == 1, 1)).alias("n_cur"),
        )
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(
        F.sum("n_ref").cast("double").alias("tr"),
        F.sum("n_cur").cast("double").alias("tc"),
    )
    p = F.greatest(F.col("n_ref") / F.col("tr"), F.lit(_EPS))
    q = F.greatest(F.col("n_cur") / F.col("tc"), F.lit(_EPS))
    terms = counts.crossJoin(F.broadcast(totals)).select(
        "bin_idx",
        "n_ref",
        "n_cur",
        ((p - q) * F.log(p / q)).alias("psi_term"),
    )
    total = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list("psi_term")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("psi_total")
    )
    return terms.crossJoin(F.broadcast(total))
