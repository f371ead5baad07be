"""Invariant tests for the ext13 tranche: gap-fill density, bigram
top-k semantics, stratified-sample quotas, int8 quantization bounds.
Value-level correctness is covered by the DuckDB oracle gate; these
assert the structural properties the oracle hash can't express.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map


def test_gapfill_grid_is_dense(spark, sf_dir):
    out = query_map()["w_gapfill_hourly"](spark, sf_dir).cache()
    try:
        buckets = out.select("bucket_us").distinct().count()
        series = out.select("event_type").distinct().count()
        # Dense grid: exactly one row per (bucket, series) cell.
        assert out.count() == buckets * series
        # The spine is contiguous: consecutive buckets are 1 hour apart.
        hrs = [r[0] for r in out.select("bucket_us").distinct().orderBy("bucket_us").collect()]
        assert all(b - a == 3_600_000_000 for a, b in zip(hrs, hrs[1:]))
        # Gap-fill produced at least one explicit empty cell on the
        # sparse sf0.001 fixture, and empties are (0, 0.0) not null.
        zeros = out.filter(F.col("n_events") == 0)
        assert zeros.count() > 0
        assert zeros.filter(F.col("total_value").isNull()).count() == 0
    finally:
        out.unpersist()


def test_topk_bigrams_bounds(spark, sf_dir):
    out = query_map()["tx_topk_bigrams"](spark, sf_dir).collect()
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r)
        assert " " in r["bigram"] and r["bigram"] == r["bigram"].lower()
        assert r["n_occurrences"] >= 1
    for rows in per_lang.values():
        assert len(rows) <= 5
        counts = [r["n_occurrences"] for r in rows]
        assert counts == sorted(counts, reverse=True)


def test_stratified_sample_quota(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {
        (r["source"], r["lang"]): r["n"]
        for r in docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    sample = query_map()["d_stratified_sample"](spark, sf_dir).collect()
    got: dict[tuple, int] = {}
    for r in sample:
        got[(r["source"], r["lang"])] = got.get((r["source"], r["lang"]), 0) + 1
    for key, n in got.items():
        assert n <= math.ceil(0.2 * totals[key])
    # Every nonempty stratum contributes at least one row (ceil >= 1).
    assert set(got) == set(totals)


def test_stratified_sample_partitioning_independent(spark, sf_dir):
    fn = query_map()["d_stratified_sample"]
    base = {tuple(r) for r in fn(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    docs.createOrReplaceTempView("_strat_repart")
    # Re-run over a differently-partitioned clone via the same logic.
    from ingestion_pipeline_spark.plans.registry_ext13 import d_stratified_sample as _  # noqa: F401
    alt = {tuple(r) for r in fn(spark, sf_dir).collect()}
    assert base == alt


def test_quantize_int8_bounds_and_reconstruction(spark, sf_dir):
    out = query_map()["v_quantize_int8"](spark, sf_dir).collect()
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert len(out) == len(emb)
    for r in out:
        codes = [int(c) for c in r["qcodes"].split(",")]
        vec = emb[r["vec_id"]]
        assert len(codes) == len(vec)
        assert all(-127 <= c <= 127 for c in codes)
        # Dequantized values reconstruct within half a quantization step.
        scale = r["scale"]
        for c, x in zip(codes, vec):
            assert abs(c * scale - x) <= scale / 2 + 1e-9


def test_repetition_ratio_bounds(spark, sf_dir):
    out = query_map()["tx_repetition_ratio"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 < r["rep_ratio"] <= 1.0
        assert r["distinct_trigrams"] <= r["n_trigrams"]
        if r["n_trigrams"] == 0:
            assert r["rep_ratio"] == 1.0


def test_gopher_flags_consistency(spark, sf_dir):
    rows = query_map()["tx_gopher_quality_flags"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        expected = (
            5 <= r["n_words"] <= 100000
            and 2.0 <= r["mean_word_len"] <= 12.0
            and r["alpha_ratio"] > 0.5
        )
        assert r["passes"] == expected
        assert 0.0 <= r["stop_ratio"] <= 1.0
        assert 0.0 <= r["alpha_ratio"] <= 1.0


def test_contamination_only_flags_overlapping_docs(spark, sf_dir):
    out = query_map()["d_contamination_5gram"](spark, sf_dir).collect()
    for r in out:
        assert r["doc_id"] % 50 != 0  # benchmark docs never self-report
        assert 0.0 < r["contamination"] <= 1.0
        assert r["n_shared"] <= r["n_shingles"]


def test_two_stage_rerank_recall_vs_exact(spark, sf_dir):
    import numpy as np

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    exact_set = set()
    for pi in np.where(ids % 100 == 0)[0]:
        order = sorted(
            ((round(sims[pi, j], 6), ids[j]) for j in range(len(ids)) if ids[j] != ids[pi]),
            key=lambda t: (-t[0], t[1]),
        )
        exact_set.update((ids[pi], vid) for _, vid in order[:5])
    two_stage = {
        (r["probe_id"], r["vec_id"])
        for r in query_map()["v_two_stage_rerank"](spark, sf_dir).collect()
    }
    # Int8-coarse candidates keep nearly all true float-cosine top-5.
    overlap = len(exact_set & two_stage)
    assert overlap / len(exact_set) >= 0.9


def test_funnel_stages_partition_users(spark, sf_dir):
    out = {r["stage"]: r["n_users"] for r in query_map()["w_funnel_conversion"](spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from ingestion_pipeline_spark.sources.parquet_tables import table as _t
    n_signup_users = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert set(out) <= {1, 2, 3}
    assert sum(out.values()) == n_signup_users
