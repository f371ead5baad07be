"""Deterministic sampling & dataset-split assignment.

Training pipelines need holdout splits and downsampling that are (a)
stable across reruns, partitionings, and engines, and (b) joinable —
the same row always lands in the same split. Spark's ``sample``/
``sampleBy`` are seeded per-partition, so the selected set CHANGES when
the partitioning changes; that is unacceptable for dataset lineage.

Here selection is a pure function of the row key: the md5 hex digest of
``salt || key`` compared lexicographically against a threshold prefix.
md5 is uniform over hex strings, so a threshold of the first k hex
chars < H keeps fraction int(H,16)/16^k — exact, reproducible anywhere
(any SQL engine with md5 can recompute membership), and shuffle-free:
the predicate evaluates in the scan's projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bucket(key: Column, salt: str, k: int = 4) -> Column:
    """First k hex chars of md5(salt || key) as an integer in
    [0, 16^k) — the row's stable sampling bucket."""
    digest = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(digest, 1, k), 16, 10).cast("long")


def deterministic_sample(key: Column, fraction: float, salt: str = "s0") -> Column:
    """Boolean keep-predicate selecting ~``fraction`` of rows, exactly
    reproducible from the key alone. Resolution is 1/65536."""
    threshold = int(round(fraction * 16**4))
    return _bucket(key, salt) < threshold


def dataset_split(
    key: Column,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split0",
) -> Column:
    """'train' | 'val' | 'test' assignment from contiguous bucket
    ranges (test gets the remainder). Same key → same split, on any
    engine, forever — the property dataset lineage requires."""
    b = _bucket(key, salt)
    t_hi = int(round(train * 16**4))
    v_hi = t_hi + int(round(val * 16**4))
    return (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
