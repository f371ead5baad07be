"""Fuzzy string matching at scale — deletion-neighborhood (FastSS /
SymSpell) candidate generation + exact edit-distance verify.

The reference pipeline keys everything on exact CVE ids; real ingest
also has to reconcile *dirty* identifiers (OCR'd names, typo'd vendor
strings, near-identical product labels). The naive answer is an
all-pairs ``levenshtein`` cross-join — O(n²) comparisons, a
non-starter at any scale. The scalable shape is the FastSS trick:

    lev(s, t) <= 1  ⇒  N(s) ∩ N(t) ≠ ∅
    where N(x) = {x} ∪ { x with one character deleted }

so an *equi-join* on the deletion-neighborhood key produces a
candidate superset (the implication is one-way: shared deletions can
also arise from lev-2 transpositions like "ab"/"ba"), and a single
exact ``levenshtein`` evaluation per candidate keeps only true
matches. Cost model at 100 TB: |corpus| × (len+1) posting rows, one
shuffle on the posting key, candidate volume ∝ Σ bucket² over tiny
buckets — the same envelope as MinHash-LSH banding (operators/
dedup.py), never a cross product.

Spark-first notes: the neighborhood is pure column math
(``sequence`` × ``substring`` concat under ``transform`` — no Python
crossing), the posting self-join is hinted ``merge`` for the same
reason as the MinHash banding join (the optimizer sizes the build
side from the pre-explode scan and would broadcast a fan-out table,
see SCALE.md "UDF-fed joins"), and the verify is the built-in JVM
``levenshtein``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _neighborhood_expr(colname: str) -> Column:
    """``{s} ∪ { s minus character i }`` as an array<string> column —
    ``transform`` over ``sequence(1, length(s))`` doing pure substr
    concatenation: whole-stage-codegen string slicing, no UDF."""
    return F.expr(
        f"array_union(array({colname}), "
        f"transform(sequence(1, length({colname})), "
        f"i -> concat(substr({colname}, 1, i-1), substr({colname}, i+1))))"
    )


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    str_col: str,
    max_dist: int = 1,
    out_prefix: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """All pairs (a, b) with ``levenshtein(a.str, b.str) <= max_dist``
    and ``a.key < b.key`` — without the O(n²) cross product.

    Currently implements the ``max_dist=1`` neighborhood (one deletion
    level); higher distances chain deletions (FastSS generalizes, at
    (len choose d) postings per row).

    Output columns: ``{a}_key, {a}_str, {b}_key, {b}_str, dist``.
    """
    if max_dist != 1:
        raise NotImplementedError("deletion-neighborhood join implemented for max_dist=1")
    a, b = out_prefix
    postings = df.select(
        F.col(key_col).alias("__key"),
        F.col(str_col).alias("__str"),
        F.explode(_neighborhood_expr(str_col)).alias("__variant"),
    )
    left = postings
    right = (
        postings.withColumnRenamed("__key", "__key_r")
        .withColumnRenamed("__str", "__str_r")
    )
    # merge hint: postings explode ~len× past the scan the optimizer
    # sizes the build side from — never broadcast a fan-out table.
    cand = (
        left.hint("merge")
        .join(right, "__variant")
        .filter(F.col("__key") < F.col("__key_r"))
        .select("__key", "__str", "__key_r", "__str_r")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("__str", "__str_r"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("__key").alias(f"{a}_key"),
            F.col("__str").alias(f"{a}_str"),
            F.col("__key_r").alias(f"{b}_key"),
            F.col("__str_r").alias(f"{b}_str"),
            "dist",
        )
    )
