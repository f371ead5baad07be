"""Nineteenth registry tranche: fuzzy entity resolution — the
deletion-neighborhood (FastSS) edit-distance self-join.

Gate domain: customer names ("Customer#000000042"-style dirty IDs —
one-digit typos abound), the classic entity-resolution shape. The
oracle is the *semantic* definition (all pairs with levenshtein <= 1,
quadratic — fine at sf0.01 in DuckDB); the Spark plan is the scalable
equi-join on deletion-neighborhood keys + exact verify, so the gate
proves candidate generation is LOSSLESS, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzy import fuzzy_self_join
from ..sources.parquet_tables import table
from .registry import register


@register(
    "j_fuzzy_name_pairs",
    """
    SELECT a.c_custkey AS a_key, a.c_name AS a_str,
           b.c_custkey AS b_key, b.c_name AS b_str,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a, customer b
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
    "Fuzzy entity resolution: every customer-name pair within edit "
    "distance 1, computed as a deletion-neighborhood equi-join "
    "(FastSS/SymSpell) + exact levenshtein verify — |rows|×(len+1) "
    "postings and one posting-key shuffle instead of the oracle's "
    "O(n²) cross product. Candidate buckets are deletion variants "
    "(tiny, uniform), so Σ bucket² stays linear-ish at 100 TB exactly "
    "like the MinHash banding join; the oracle proves the candidate "
    "set is lossless for dist<=1.",
)
def j_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return fuzzy_self_join(cust, "c_custkey", "c_name", max_dist=1)
