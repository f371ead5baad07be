"""Vector column math (SURVEY §2.10 V3-V5).

The reference delegates similarity to Pinecone/pgvector with cosine
metric (``consumer/consumer.py:61-63``); here vectors are first-class
``array<float>`` columns and similarity is a Column expression built from
``zip_with``/``aggregate`` — JVM-side, no UDF, so a cosine scan
distributes like any other projection.

All math is done in double precision with a fixed left-to-right fold, so
results are bit-stable across partitionings and match a sequential
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def normalize(a: Column) -> Column:
    """L2-normalize (pre-normalizing once makes cosine a plain dot product
    — do this at write time for the 100 TB corpus so every query saves a
    per-row sqrt)."""
    n = norm(a)
    return F.when(n > 0, F.transform(_d(a), lambda x: x / n)).otherwise(_d(a))
