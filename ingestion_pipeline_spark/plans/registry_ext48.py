"""Forty-eighth registry tranche: value-gated MinHash-LSH banding.

``d_minhash_lsh_md5_pairs`` — the COMPLETE LSH candidate pipeline
(shingle → minhash signature → band → bucket equi-join → distinct
pairs) under a full DuckDB value hash, using the portable md5 hash
family that ``d_minhash_md5_signatures`` already gates. The production
path (``d_minhash_lsh_candidates``) runs the identical algebra on
xxhash64 (cheaper, engine-native, no DuckDB equivalent → rows-only +
recall pytest); this query proves the banding/bucketing machinery
itself value-exact, leaving only the hash function unverifiable.

Reference provenance: near-dup candidate generation is beyond-reference
surface (the reference dedups by primary key only,
processor.py:55-59); the MinHash/LSH scheme is Broder 1997 /
Leskovec-Rajaraman-Ullman ch.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import spread
from ..sources.parquet_tables import table
from .registry import SQL_TOKENS, register

_SQL_TOKS = SQL_TOKENS.format(col="text")
_SQL_SHINGLES = f"""
    list_distinct(CASE WHEN len({_SQL_TOKS}) >= 3 THEN
        list_transform(range(0, greatest(len({_SQL_TOKS}) - 3, 0) + 1),
                       i -> array_to_string(list_slice({_SQL_TOKS}, i + 1, i + 3), ' '))
        ELSE [] END)
"""

_N_HASHES = 8
_N_BANDS = 4  # 4 bands x 2 rows


def _mh_sql(i: int) -> str:
    return (
        f"list_min(list_transform({_SQL_SHINGLES}, "
        f"s -> md5(CAST({i} AS VARCHAR) || '|' || s))) AS mh_{i}"
    )


_BANDS_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, mh_{2 * b} || mh_{2 * b + 1} AS bucket "
    "FROM sig WHERE mh_0 IS NOT NULL"
    for b in range(_N_BANDS)
)


@register(
    "d_minhash_lsh_md5_pairs",
    f"""
    WITH sig AS (
        SELECT doc_id, {', '.join(_mh_sql(i) for i in range(_N_HASHES))}
        FROM documents
    ),
    bands AS ({_BANDS_UNION})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    "MinHash+LSH candidate pairs with the portable md5 hash family, "
    "end-to-end under the value hash: 8 min-hashes over 3-gram "
    "shingles, 4 bands x 2 rows concatenated into bucket keys, "
    "band+bucket self-equi-join, distinct (id_a < id_b) pairs. "
    "Shingle-less docs (< 3 tokens) produce NULL signatures and are "
    "excluded on both sides. No cross product anywhere: the join key "
    "is a hash bucket, so the shuffle is uniform at any corpus size — "
    "the same plan shape as the xxhash64 production variant "
    "(d_minhash_lsh_candidates), whose hash DuckDB cannot replay.",
)
def d_minhash_lsh_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_md5_slots

    docs = spread(table(spark, sf_dir, "documents"), min_partitions=8)

    # ONE Arrow kernel pass per batch computes all 8 slots straight
    # from text (value-equal to the interpreted-HOF md5 form the
    # oracle replays — VERDICT r7 #3 killed the
    # 8-interpreted-md5-per-shingle tax).
    mh8 = minhash_md5_slots(_N_HASHES)
    sig = (
        docs.select("doc_id", mh8(F.col("text")).alias("__mh"))
        .select(
            "doc_id",
            *[F.col("__mh").getItem(i).alias(f"mh_{i}") for i in range(_N_HASHES)],
        )
        .filter(F.col("mh_0").isNotNull())
        # both sides of the banded self-join consume sig; without
        # materialization the compiled plan ran the md5-minhash Arrow
        # kernel per side (8 ArrowEvalPython nodes, 4 scans — r12 scan
        # census). ONE kernel pass over the corpus, checkpointed skinny
        # (doc_id + 8 hex slots); released by per-query hygiene.
        .localCheckpoint(eager=False)
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}"))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    # r13: shared banded self-join (optional hot-bucket skew split,
    # guide §2.5 — value-identical, engaged via $SPARK_GRAFT_LSH_HOT_BUCKET;
    # join_hint=None keeps this variant's pre-r13 unhinted plan when
    # the knob is unset).
    from ..operators.dedup import banded_self_join_pairs

    return banded_self_join_pairs(bands, id_col="doc_id", join_hint=None)
