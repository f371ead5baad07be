"""Twenty-fourth registry tranche: product-quantized ANN (PQ/ADC).

``v_pq_adc_topk`` completes the ANN ladder: LSH (hash pruning), IVF
(cluster pruning), two-stage Matryoshka rerank (dimension pruning),
and now PQ (bit-width pruning — 32× smaller index scanned via ADC
table lookups). Deterministic training → reproducible codes, but the
scores are approximate float fixpoints of a k-means, so the gate is
rows-only; recall vs the exact oracle-gated top-k is pinned in
``tests/test_pq.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pq import pq_topk, train_pq_codebooks
from ..sources.parquet_tables import table
from .registry import register


@register(
    "v_pq_adc_topk",
    None,  # k-means float fixpoint — rows-only; recall/compression in pytest
    "Product-quantization ANN: 64-d vectors → M=8 sub-codes from "
    "K=16-entry per-subspace codebooks (256 B -> 8 B, 32×; the margin "
    "that fits a 100 TB corpus's index in memory), probe scored via "
    "the broadcast ADC lookup table (M numpy gathers per row, no "
    "float vectors touched), top-64 candidates exactly reranked to "
    "top-8. Codebooks train driver-side on a bounded sample "
    "(deterministic Lloyd iterations, first-K init) — O(sample) "
    "collect, never O(corpus); encoding is write-time mapInPandas "
    "like the IVF assignment.",
)
def v_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import _probe

    emb = table(spark, sf_dir, "embeddings")
    # bounded training sample: first 256 vectors by id (deterministic)
    sample = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 256)
        .select("embedding")
        .orderBy("vec_id")
        .collect()
    ]
    books = train_pq_codebooks(sample, m=8, k=16, iters=5)
    probe = _probe(spark, sf_dir)
    return pq_topk(
        emb, "embedding", "vec_id", probe, books, k=8, candidates=64, exclude_id=0
    ).select("vec_id", "sim")
