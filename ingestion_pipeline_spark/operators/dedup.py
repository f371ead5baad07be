"""Deduplication family for training-data pipelines.

Not present in the reference (its universe is keyed by CVE id, so dedup
is implicit); required for the 100 TB corpus use-case. Four strategies,
cheapest-first:

- exact:   hash-groupBy on a normalized fingerprint — one shuffle.
- simhash: 64-bit near-dup signature; Hamming-close docs share signature
  prefixes. Shuffle on signature key.
- minhash+LSH: shingle → minhash signature → banded bucket join —
  candidate pairs only within buckets, never O(n²).
- n-gram Jaccard: exact verification on candidate pairs (used standalone
  at fixture scale, as the re-rank stage after LSH at 100 TB).

All built from JVM-side functions (xxhash64, transform, aggregate); no
Python UDFs, so every stage is codegen'd and shuffle-bound only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import content_md5, word_tokens
from .relational import spread


def normalized_text(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: groupBy md5(normalized text); keep the min-id
    canonical representative + member count. Single hash-shuffle on the
    digest — uniform key distribution, no skew at any scale."""
    return (
        df.select(content_md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct). Column-only: sliding window via
    transform over token indices.

    The token array is bound to a lambda variable by wrapping it in a
    one-element array and transforming over it — so the (expensive)
    tokenization is evaluated once per row, not once per reference;
    per-gram assembly uses element_at (no array copies like slice)."""
    toks = word_tokens(F.lower(col))

    def build(t: Column) -> Column:
        count = F.size(t)
        idx = F.sequence(F.lit(0), F.greatest(count - n, F.lit(0)))
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)]),
        )
        return F.array_distinct(F.when(count >= n, grams).otherwise(F.array()))

    return F.element_at(F.transform(F.array(toks), build), 1)


def hashed_shingles(shingle_col: Column, seed: int = 42) -> Column:
    """One expensive string-hash pass: shingle strings → array<bigint>.
    Materialize this as a column BEFORE computing signatures so it is
    evaluated once, not once per hash function."""
    return F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(seed)))


def minhash_signature(hashed_col: Column, n_hashes: int = 32) -> Column:
    """MinHash signature as array<bigint> over pre-hashed shingles (see
    ``hashed_shingles``): the i-th hash function is a cheap re-hash of
    the 64-bit value with seed i — n_hashes bigint passes instead of
    n_hashes string passes."""
    # NB: the lambda must be arity-1 — a two-arg lambda would make
    # F.transform pass the ELEMENT INDEX as the second argument.
    def rehash_with(i: int):
        return lambda h: F.xxhash64(h, F.lit(i))

    mins = [F.array_min(F.transform(hashed_col, rehash_with(i))) for i in range(n_hashes)]
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b) whose minhash signatures
    collide in ≥1 band (default 16 bands × 2 rows: P(collision) ≈
    1-(1-J²)¹⁶ — >0.99 at J≥0.55; false positives are cheap because the
    Jaccard re-rank stage filters them). Plan: project signature → explode bands →
    self-equi-join on (band, bucket-hash) → distinct pairs. The join key
    is a hash bucket, so this scales as a normal shuffle join; no cross
    product exists anywhere in the plan."""
    rows = n_hashes // n_bands
    banded = (
        spread(df)
        .select(F.col(id_col).alias("doc"), shingles(F.col(text_col), shingle_n).alias("__sh"))
        .select("doc", hashed_shingles(F.col("__sh")).alias("__hs"))
        .select("doc", minhash_signature(F.col("__hs"), n_hashes).alias("__sig"))
        .select(
            "doc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(F.concat_ws(",", F.slice(F.col("__sig"), b * rows + 1, rows))).alias("bucket"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )


def simhash64(col: Column, n: int = 3) -> Column:
    """64-bit SimHash over word n-gram shingles, returned as a 64-char
    bit-string: one pass over the shingle hashes with an array-of-votes
    accumulator (zip_with inside aggregate — still pure column math),
    then sign of each vote becomes the bit. Hamming distance between two
    signatures = differing chars; near-dups share long prefixes, so a
    sort/groupBy on (rotated) signatures finds them without pair joins."""
    sh = shingles(col, n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    votes = F.aggregate(
        hashes,
        F.array(*[F.lit(0) for _ in range(64)]),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for b in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    return F.array_join(F.transform(votes, lambda v: F.when(v >= 0, F.lit("1")).otherwise(F.lit("0"))), "")


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity on co-blocked pairs (id_a < id_b):
    J = |A∩B| / |A∪B| over word-shingle sets. ``block_col`` bounds the
    pair space (at 100 TB the block key is the LSH bucket from
    ``minhash_lsh_candidates``; here any low-cardinality column works).
    """
    base = spread(df).select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
