"""Forty-second registry tranche: asymmetric containment dedup.

``d_containment_pairs`` — containment C = |A∩B| / min(|A|,|B|) over
word-shingle sets, within (source, lang) blocks. The dedup measure
Jaccard structurally misses: a short document fully quoted inside a
long one scores J ≈ |short|/|long| (tiny) but C = 1.0 — exactly the
excerpt/concatenated-dump duplication mode common in crawled corpora
(Lee et al. 2022 §4.2 discuss substring dups for the same reason).
Shares the inverted-index posting-join skeleton with
``d_jaccard_pairs`` and adds the containment direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..sources.parquet_tables import table
from .registry import _SHINGLES_SQL, register


@register(
    "d_containment_pairs",
    f"""
    WITH sh AS (
        SELECT source || '|' || lang AS block, doc_id AS doc,
               {_SHINGLES_SQL} AS s
        FROM documents
    )
    SELECT id_a, id_b, containment, contained_id FROM (
        SELECT a.doc AS id_a, b.doc AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / LEAST(len(a.s), len(b.s)), 6) AS containment,
               CASE WHEN len(a.s) <= len(b.s) THEN a.doc ELSE b.doc END
                   AS contained_id
        FROM sh a JOIN sh b ON a.block = b.block AND a.doc < b.doc
    ) WHERE containment >= 0.5
    """,
    "Asymmetric containment near-dups within (source, lang) blocks: "
    "C = |A∩B| / min(|A|,|B|) with the contained (smaller) side "
    "identified — catches excerpts/quoted-inside dups that Jaccard "
    "scores near zero. Same inverted-index posting join as "
    "d_jaccard_pairs: pairs sharing zero shingles are never "
    "enumerated, hot-shingle skew bounded by within-block n-gram "
    "frequency, AQE splits the rest.",
)
def d_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn(
        "block", F.concat_ws("|", F.col("source"), F.col("lang"))
    )
    return dd.containment_pairs(docs, "text", "doc_id", "block", threshold=0.5)
