"""Thirty-fifth registry tranche: multimodal near-dup detection.

``mm_ahash_dup_groups`` — perceptual-hash dedup over binary media
payloads: 32-bit average hash per item (``operators/multimodal.py:
average_hash32`` — bit set iff byte above the exact-integer window
mean), hash-groupBy, keep groups with >= 2 items. The image-dedup
counterpart of ``d_exact_dup_groups``: aHash tolerates the small
payload perturbations (re-encode, metadata churn) that break md5
identity, while staying a single hash shuffle — no pair joins.

The fixture stands documents' text bytes in for media blobs (same
convention as ``mm_media_features``; the container ships no codecs) and
the DuckDB oracle replays the identical integer bit math over the
leading character codes — byte-for-byte equal on the ASCII fixture, so
the gate is value-exact THROUGH the Arrow/mapInPandas path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import average_hash32
from ..operators.relational import spread
from ..sources.parquet_tables import table
from .registry import register


@register(
    "mm_ahash_dup_groups",
    """
    WITH b AS (
        SELECT doc_id, unnest(generate_series(1, 32)) AS i, text
        FROM documents WHERE length(text) >= 32
    ),
    codes AS (SELECT doc_id, i, unicode(substr(text, i, 1)) AS c FROM b),
    tot AS (SELECT doc_id, SUM(c) AS total FROM codes GROUP BY doc_id),
    hashed AS (
        SELECT c.doc_id,
               CAST(SUM(CASE WHEN c.c * 32 > t.total
                             THEN (CAST(1 AS BIGINT) << (32 - c.i))
                             ELSE 0 END) AS BIGINT) AS ahash32
        FROM codes c JOIN tot t USING (doc_id)
        GROUP BY c.doc_id
    )
    SELECT ahash32,
           COUNT(*) AS n_items,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM hashed GROUP BY ahash32
    HAVING COUNT(*) >= 2
    """,
    "Perceptual-hash (aHash) media dedup: 32-bit average hash per "
    "payload in exact integer space (byte*32 > window total — no float "
    "threshold to disagree on), one hash-groupBy, groups >= 2. "
    "Re-encoded/perturbed payloads that defeat md5 collide here; the "
    "shuffle carries (8-byte hash, id) however large the media. Oracle "
    "replays the identical bit math, proving the Arrow mapInPandas "
    "path value-exact end to end.",
)
def mm_ahash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), min_partitions=8)
    media = docs.filter(F.length("text") >= 32).select(
        F.col("doc_id").cast("string").alias("path"),
        F.encode("text", "UTF-8").alias("content"),
    )
    hashed = average_hash32(media)
    return (
        hashed.filter(F.col("ahash32").isNotNull())
        .groupBy("ahash32")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(F.col("path").cast("long")).alias("min_doc"),
            F.max(F.col("path").cast("long")).alias("max_doc"),
        )
        .filter(F.col("n_items") >= 2)
    )
