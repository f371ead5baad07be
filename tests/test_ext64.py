"""Tranche-64 semantics: mixture-manifest dyadic-acceptance laws (full
pure-Python recompute — which also pins reprocessing stability, since
decisions are pure functions of (doc_id, source tilt)), LSH
band-tuning monotonicity and the 4x2 consistency pin, Benford
accounting.  Value math is oracle-gated; these pin the LAWS."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map


def _draw(doc_id: int) -> int:
    h = hashlib.md5(f"mix{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % 128


def test_mixture_manifest_matches_python_recompute(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per: dict[str, list[int]] = {}
    n_docs: dict[str, int] = {}
    for r in docs:
        per.setdefault(r["source"], []).append(min(r["n_chars"], 2000))
        n_docs[r["source"]] = n_docs.get(r["source"], 0) + 1
    loss = {s: sum(v) // len(v) for s, v in per.items()}
    m = max(loss.values())
    tilt = {s: (v * 8) // (m + 1) for s, v in loss.items()}
    want = {
        r["doc_id"]: (r["source"], tilt[r["source"]])
        for r in docs
        if _draw(r["doc_id"]) < (1 << tilt[r["source"]])
    }
    got = {
        r["doc_id"]: (r["source"], r["tilt_exp"])
        for r in query_map()["pipeline_mixture_manifest"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    # the max-loss source accepts EVERYTHING (tilt 7 -> rate 128/128)
    top = max(loss, key=lambda s: (loss[s], s))
    assert sum(1 for s, _ in got.values() if s == top) == n_docs[top]


def test_band_tuning_monotone_and_consistent(spark, sf_dir):
    rows = {
        r["cfg"]: r
        for r in query_map()["d_minhash_band_tuning"](spark, sf_dir).collect()
    }
    assert set(rows) == {"b8r1", "b4r2", "b2r4", "b1r8"}
    for r in rows.values():
        assert r["n_bands"] * r["rows_per_band"] == 8
        assert 0 <= r["n_candidate_pairs"] <= r["n_bucket_slots"]
    # the S-curve law on the EXACT workload column (join-free, so it
    # holds regardless of hot-bucket capping): a pair matching an
    # r-row band matches every 1-row sub-band — slot counts are
    # monotone from the precision end to the recall end
    assert (
        rows["b8r1"]["n_bucket_slots"]
        >= rows["b4r2"]["n_bucket_slots"]
        >= rows["b2r4"]["n_bucket_slots"]
        >= rows["b1r8"]["n_bucket_slots"]
    )
    # candidate pairs are monotone too wherever no config lost pairs
    # to the hot-bucket census
    if all(r["n_hot_buckets"] == 0 for r in rows.values()):
        assert (
            rows["b8r1"]["n_candidate_pairs"]
            >= rows["b4r2"]["n_candidate_pairs"]
            >= rows["b2r4"]["n_candidate_pairs"]
            >= rows["b1r8"]["n_candidate_pairs"]
        )
    # consistency with the shipped 4x2 pipeline: the fixtures keep the
    # 4x2 config hot-free, so its pair count is IDENTICAL to the full
    # d_minhash_lsh_md5_pairs pipeline
    assert rows["b4r2"]["n_hot_buckets"] == 0
    lsh = query_map()["d_minhash_lsh_md5_pairs"](spark, sf_dir).count()
    assert rows["b4r2"]["n_candidate_pairs"] == lsh


def test_benford_accounting(spark, sf_dir):
    rows = query_map()["dq_benford_deviation"](spark, sf_dir).collect()
    assert len(rows) == 9
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.filter(F.col("o_totalprice") >= 1).count()
    assert sum(r["n_orders"] for r in rows) == n
    shares = sum(r["expected_share"] for r in rows)
    assert abs(shares - 1.0) < 1e-12  # Benford shares are a partition
    for r in rows:
        assert 1 <= r["digit"] <= 9
        assert abs(r["observed_share"] - r["n_orders"] / n) < 1e-6
