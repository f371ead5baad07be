"""Twenty-first registry tranche: three corpus-curation/warehouse ops —

- ``d_weighted_sample``: Efraimidis–Spirakis (A-ES) weighted sampling
  without replacement — THE deterministic distributed answer to
  "sample k docs proportional to quality/length". Each row's key is
  ``ln(u)/w`` with ``u`` a content-hash uniform, so the sample is a
  pure column expression + TakeOrdered: partitioning-independent,
  replayable, no driver-side state, identical under retries.
- ``w_scd2_user_state``: SCD2/temporal-snapshot interval construction
  (validity ranges from an event stream via ``lead`` over one keyed
  window) — the warehouse-side "as-of state" builder.
- ``v_hybrid_rrf_fusion``: reciprocal-rank fusion of the lexical
  (BM25) and vector (cosine) retrieval lists — hybrid search's
  standard merge, composed entirely from this engine's own operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.search import bm25_topk
from ..operators.similarity import brute_force_topk
from ..sources.parquet_tables import table
from .registry import register
from .registry_ext20 import TERMS

_SAMPLE_K = 50
_RRF_C = 60  # the standard reciprocal-rank-fusion constant


@register(
    "d_weighted_sample",
    f"""
    SELECT doc_id, source, n_chars, key FROM (
        SELECT doc_id, source, n_chars,
               ln((CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) + 1)
                  / 4294967296.0) / CAST(n_chars AS DOUBLE) AS key
        FROM documents
    )
    ORDER BY key DESC, doc_id
    LIMIT {_SAMPLE_K}
    """,
    "Weighted sampling without replacement (Efraimidis–Spirakis A-ES): "
    "key = ln(u)/w with w = n_chars and u = (md5(text)[0:8] + 1)/2^32 "
    "∈ (0,1]; the top-k keys ARE a w-proportional sample. The content-"
    "hash uniform makes it deterministic and partitioning-independent "
    "(same sample on any cluster layout, under any retry) and the plan "
    "is one scan projection + TakeOrdered — no shuffle, no RNG state. "
    "The quality-weighted corpus subset selector at any scale.",
)
def d_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") + 1) / F.lit(
        4294967296.0
    )
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("key"))
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(_SAMPLE_K)
    )


@register(
    "w_scd2_user_state",
    """
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id),
                    -1) AS valid_to_us
    FROM events
    WHERE user_id < 100
    """,
    "SCD2 interval construction: each event opens a state row whose "
    "validity closes at the user's next event (lead over one user_id "
    "window; -1 = current/open state — a sentinel rather than NULL so "
    "the oracle's pandas fetch cannot coerce the nullable int column "
    "to float). One shuffle on the entity key + a "
    "per-partition sort — the standard temporal-snapshot builder; "
    "point-in-time state is then a BETWEEN filter, and the as-of join "
    "(operators/relational.py:asof_join) consumes exactly this shape.",
)
def w_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "user_id",
        "event_type",
        us.alias("valid_from_us"),
        F.coalesce(F.lead(us).over(w), F.lit(-1)).alias("valid_to_us"),
    )


# lexical and vector CTEs reproduce the t_bm25_keyword_topk /
# v_cosine_top8 oracles verbatim (same expressions, same tie-breaks);
# the BM25 text is pulled from its registered spec so the two can
# never drift apart.
from .registry import REGISTRY as _REG
from .registry import _COS_SQL

_RRF_SQL = f"""
    WITH lex AS ({_REG["t_bm25_keyword_topk"].sql}),
    vec AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY sim DESC, vec_id) AS vec_rank
        FROM (
            SELECT e.vec_id, {_COS_SQL} AS sim
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) p
            WHERE e.vec_id <> 0
            ORDER BY sim DESC, e.vec_id
            LIMIT 8
        )
    )
    SELECT COALESCE(l.doc_id, v.vec_id) AS id,
           COALESCE(l.rank, 0) AS lex_rank,
           COALESCE(v.vec_rank, 0) AS vec_rank,
           COALESCE(1.0 / ({_RRF_C} + l.rank), 0.0)
         + COALESCE(1.0 / ({_RRF_C} + v.vec_rank), 0.0) AS rrf_score
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
    ORDER BY rrf_score DESC, id
"""


@register(
    "v_hybrid_rrf_fusion",
    _RRF_SQL,
    "Hybrid retrieval: reciprocal-rank fusion (1/(60+rank), the "
    "standard RRF merge) of the BM25 lexical top-10 and the cosine "
    "vector top-8 over the shared doc_id/vec_id key space. Both input "
    "lists are this engine's own oracle-gated operators; the fusion is "
    "a full-outer join of two tiny ranked lists + a fixed-order float "
    "sum — free at any corpus size once the per-modality top-k exist.",
)
def v_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")

    lex = bm25_topk(docs, "text", "doc_id", TERMS, k=10).select(
        F.col("doc_id").alias("id"), F.col("rank").alias("lex_rank")
    )

    probe_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    probe = [float(x) for x in probe_row["embedding"]]
    vec_hits = brute_force_topk(emb, "embedding", probe, k=8, exclude_id=0)
    vec = vec_hits.withColumn(
        "vec_rank",
        F.row_number().over(Window.orderBy(F.col("sim").desc(), F.col("vec_id"))),
    ).select(F.col("vec_id").alias("id"), "vec_rank")

    fused = lex.join(vec, "id", "full_outer").select(
        "id",
        F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(float(_RRF_C)) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(_RRF_C)) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf_score"),
        # ranks coalesce to 0 = "absent from this modality's list" (and
        # keep the oracle's pandas fetch from floating the int columns)
    )
    return fused.orderBy(F.col("rrf_score").desc(), "id")
