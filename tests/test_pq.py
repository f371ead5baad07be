"""Product quantization: reconstruction sanity, code validity,
determinism, and recall of the two-stage ADC search vs exact top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ingestion_pipeline_spark.operators.pq import (
    adc_score,
    encode_pq,
    pq_topk,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from ingestion_pipeline_spark.sources.parquet_tables import table

    return table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    sample = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 256).orderBy("vec_id").collect()
    ]
    return train_pq_codebooks(sample, m=8, k=16, iters=5)


def test_codebook_shape_and_determinism(emb, books):
    assert books.shape == (8, 16, 8)
    sample = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 256).orderBy("vec_id").collect()
    ]
    again = train_pq_codebooks(sample, m=8, k=16, iters=5)
    assert np.array_equal(books, again)


def test_codes_valid_and_deterministic(emb, books):
    coded = emb.select("vec_id", encode_pq(emb, "embedding", books).alias("codes"))
    rows = {r["vec_id"]: r["codes"] for r in coded.collect()}
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in rows.values())
    rows2 = {r["vec_id"]: r["codes"] for r in coded.collect()}
    assert rows == rows2


def test_quantization_reduces_reconstruction_error(emb, books):
    # PQ decode must beat the trivial all-zeros "codebook" on MSE
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.orderBy("vec_id").collect()]
    )
    m, k, d_sub = books.shape
    err = 0.0
    for mi in range(m):
        sub = X[:, mi * d_sub : (mi + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
        err += d2.min(axis=1).sum()
    baseline = (X**2).sum()
    # random 64-d fixture vectors are PQ's worst case (no manifold
    # structure; 16 codewords per 8-d subspace): ~25-35% MSE reduction.
    # A mean-only codebook would sit at ~1.0x for zero-mean data, so
    # anything clearly below that proves the quantizer learns.
    assert err < 0.85 * baseline


def test_adc_recall_vs_exact(spark, emb, books):
    from ingestion_pipeline_spark.operators.similarity import brute_force_topk

    probe_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    probe = [float(x) for x in probe_row["embedding"]]

    exact = {
        r["vec_id"]
        for r in brute_force_topk(emb, "embedding", probe, k=8, exclude_id=0).collect()
    }
    approx_rows = pq_topk(
        emb, "embedding", "vec_id", probe, books, k=8, candidates=64, exclude_id=0
    ).collect()
    approx = {r["vec_id"] for r in approx_rows}
    # two-stage rerank: every returned sim is EXACT; recall@8 >= 0.5 on
    # the 64-candidate shortlist (random 64-d fixture vectors are a
    # worst case for PQ — real embedding manifolds quantize far better)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5
    sims = [r["sim"] for r in approx_rows]
    assert sims == sorted(sims, reverse=True)


def test_adc_score_orders_like_dot_product(spark, emb, books):
    # ADC approximates dot(probe, x): correlation with the true dot
    # product across the corpus should be strongly positive
    probe_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    probe = np.asarray(probe_row["embedding"], dtype=np.float64)

    coded = emb.select(
        "vec_id", "embedding", encode_pq(emb, "embedding", books).alias("codes")
    )
    scored = coded.withColumn(
        "adc", adc_score("codes", [float(x) for x in probe], books)
    ).collect()
    adc = np.array([r["adc"] for r in scored])
    true = np.array(
        [np.dot(probe, np.asarray(r["embedding"], dtype=np.float64)) for r in scored]
    )
    corr = np.corrcoef(adc, true)[0, 1]
    # measured ~0.73 on the random fixture; real embeddings correlate
    # far higher. The two-stage rerank makes final sims exact either way.
    assert corr > 0.6


def test_ivfadc_composition_recall(spark, sf_dir):
    """The composed IVF->ADC->rerank pipeline returns 8 results with
    reasonable recall vs exact top-8 (pruning to nprobe=4 of 16 cells
    plus PQ approximation can miss some — but never most — neighbors),
    and every returned sim is exact (the rerank stage recomputes true
    cosine)."""
    from ingestion_pipeline_spark.operators.similarity import brute_force_topk
    from ingestion_pipeline_spark.plans import query_map
    from ingestion_pipeline_spark.plans.registry import _probe
    from pyspark.sql import functions as F

    out = query_map()["v_ivfadc_topk"](spark, sf_dir).collect()
    assert len(out) == 8
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        r["vec_id"]: r["sim"]
        for r in brute_force_topk(
            emb, "embedding", _probe(spark, sf_dir), k=8, exclude_id=0
        ).collect()
    }
    hits = [r for r in out if r["vec_id"] in exact]
    assert len(hits) >= 4  # recall@8 >= 0.5 through both approximations
    # reranked sims are EXACT where ids overlap
    for r in hits:
        assert abs(r["sim"] - exact[r["vec_id"]]) < 1e-9
