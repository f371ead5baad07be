"""Thirty-eighth registry tranche: diversified retrieval (MMR).

``v_mmr_rerank`` — maximal-marginal-relevance re-ranking on top of the
exact cosine retrieval: top-30 candidates by relevance, then the greedy
MMR sweep picks 5 balancing relevance against redundancy (λ=0.7). The
standard fix for RAG context windows full of near-duplicate chunks —
and the natural consumer of this repo's near-dup machinery: without
MMR, a corpus with dup families (ours, by construction) fills all k
slots with copies of the best hit.

Iterative greedy selection → rows-only gate; the selection math is
pinned against an independent pure-Python MMR in
``tests/test_mmr.py``, and the relevance stage underneath is the
oracle-gated ``brute_force_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import brute_force_topk, mmr_rerank
from ..sources.parquet_tables import table
from .registry import register


@register(
    "v_mmr_rerank",
    None,  # iterative greedy selection — rows-only; pinned in test_mmr.py
    "MMR-diversified retrieval (Carbonell & Goldstein 1998): oracle-"
    "gated exact cosine top-30, then the greedy "
    "λ·relevance − (1−λ)·max-sim-to-selected sweep picks 5 — on a "
    "corpus with dup families, plain top-k returns copies; MMR "
    "returns the family's best member plus genuinely different "
    "contexts. The sweep runs driver-side over the top-N-bounded "
    "candidate set (the bounded-collect class); the distributed work "
    "is the retrieval stage beneath it.",
)
def v_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import _probe

    emb = table(spark, sf_dir, "embeddings")
    cands = (
        brute_force_topk(
            emb, "embedding", _probe(spark, sf_dir), k=30, exclude_id=0
        )
        .select("vec_id", "sim")
        .join(emb.select("vec_id", "embedding"), "vec_id")
    )
    picked = mmr_rerank(cands, k=5, lam=0.7)
    return spark.createDataFrame(
        [(rank, vid, rel, score) for rank, (vid, rel, score) in enumerate(picked)],
        "mmr_rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE",
    )
