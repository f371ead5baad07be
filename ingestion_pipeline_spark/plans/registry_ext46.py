"""Forty-sixth registry tranche: IVF-PQ (IVFADC) composed ANN.

``v_ivfadc_topk`` — the production billion-scale ANN shape (FAISS's
IVFADC default; Jégou et al. 2011 §IV): IVF coarse quantization prunes
WHICH vectors a probe touches (nprobe=4 of 16 cells → ~1/4 of the
corpus), PQ/ADC shrinks WHAT is read for the scanned ones (8-byte codes
+ a broadcast lookup table instead of float vectors), and an exact
rerank over the top candidates restores precision. Every stage is a
component this repo already verifies separately — deterministic IVF
centroids (``v_ivf_topk``, exact oracle), deterministic PQ codebooks +
ADC (``v_pq_adc_topk``, Python-pinned), exact rerank
(``brute_force_topk``, oracle) — composed here exactly as a production
index would run them. Iterative k-means training → rows-only gate;
recall vs exact top-k asserted in ``tests/test_pq.py``.

At 100 TB: the coarse assignment is one Arrow argmax per batch, the
ADC scan reads M-byte codes (32× less IO than floats), and only
|candidates| true vectors are ever fetched — the memory/IO math that
makes a cluster-resident index possible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..operators.pq import pq_topk, train_pq_codebooks
from ..operators.relational import spread
from ..sources.parquet_tables import table
from .registry import register


@register(
    "v_ivfadc_topk",
    None,  # k-means codebook training is an iterative float fixpoint —
    # rows-only; component math pinned in test_pq.py / oracle-gated in
    # v_ivf_topk; composition recall asserted in test_pq.py
    "IVF-PQ composed ANN (FAISS IVFADC shape): coarse-quantize to 16 "
    "deterministic cells, keep the probe's nprobe=4 nearest cells, "
    "ADC-scan only those members' 8-byte PQ codes against the "
    "broadcast lookup table, exact-rerank the top-32 — composition of "
    "three independently-verified stages. Candidate volume scales as "
    "nprobe/16 of the corpus and the scan reads codes, not floats.",
)
def v_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import _probe

    emb = spread(table(spark, sf_dir, "embeddings"), min_partitions=8)

    # --- IVF stage: deterministic centroids, probe's nprobe cells ----
    centroid_rows = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )

    def l2norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else list(v)

    centroids = [l2norm([float(x) for x in r["embedding"]]) for r in centroid_rows]
    probe = _probe(spark, sf_dir)

    def cos_py(a, b):
        return sum(x * y for x, y in zip(l2norm(a), l2norm(b)))

    keep = sorted(range(16), key=lambda i: -cos_py(probe, centroids[i]))[:4]
    nearest = sim.assign_nearest_np(centroids)
    cell_members = emb.withColumn("cluster", nearest(F.col("embedding"))).filter(
        F.col("cluster").isin(keep)
    )

    # --- PQ/ADC + exact rerank over the surviving cells --------------
    train = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 256)
        .select("embedding")
        .orderBy("vec_id")
        .collect()
    ]
    codebooks = train_pq_codebooks(train, m=8, k=16)
    return pq_topk(
        cell_members,
        "embedding",
        "vec_id",
        probe,
        codebooks,
        k=8,
        candidates=32,
        exclude_id=0,
    )
