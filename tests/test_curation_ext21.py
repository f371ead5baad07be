"""ext21 tranche: weighted sampling determinism, SCD2 interval
contiguity, RRF fusion arithmetic."""

from __future__ import annotations

import hashlib
import math

from ingestion_pipeline_spark.plans.registry_ext21 import (
    d_weighted_sample,
    v_hybrid_rrf_fusion,
    w_scd2_user_state,
)

SF = "/root/testdata/sf0.001"


def _aes_key(text: str, w: int) -> float:
    u = (int(hashlib.md5(text.encode()).hexdigest()[:8], 16) + 1) / 4294967296.0
    return math.log(u) / w


def test_weighted_sample_matches_python_reference(spark):
    from ingestion_pipeline_spark.sources.parquet_tables import table

    docs = table(spark, SF, "documents").select("doc_id", "text", "n_chars").collect()
    keys = sorted(
        ((_aes_key(r["text"], r["n_chars"]), r["doc_id"]) for r in docs),
        key=lambda kv: (-kv[0], kv[1]),
    )
    want = [d for _, d in keys[:50]]
    got = [r["doc_id"] for r in d_weighted_sample(spark, SF).collect()]
    assert got == want


def test_weighted_sample_partitioning_independent(spark):
    a = [r["doc_id"] for r in d_weighted_sample(spark, SF).collect()]
    # same query over a repartitioned scan must pick the identical sample
    from ingestion_pipeline_spark.sources.parquet_tables import table
    import pyspark.sql.functions as F

    docs = table(spark, SF, "documents").repartition(7)
    u = (F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") + 1) / F.lit(
        4294967296.0
    )
    key = F.log(u) / F.col("n_chars").cast("double")
    b = [
        r["doc_id"]
        for r in docs.select("doc_id", key.alias("key"))
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(50)
        .collect()
    ]
    assert a == b


def test_scd2_intervals_contiguous(spark):
    rows = w_scd2_user_state(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from_us"])
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
        assert ivs[-1]["valid_to_us"] == -1  # open/current state


def test_rrf_arithmetic_and_membership(spark):
    rows = v_hybrid_rrf_fusion(spark, SF).collect()
    assert rows
    for r in rows:
        want = 0.0
        if r["lex_rank"] > 0:
            want += 1.0 / (60 + r["lex_rank"])
        if r["vec_rank"] > 0:
            want += 1.0 / (60 + r["vec_rank"])
        assert r["rrf_score"] == want
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
