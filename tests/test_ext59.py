"""Tranche-59 semantics: label-outlier geometry against a pure-Python
reference, PMI sign/ordering laws, and the lateness profile's
watermark-sizing identity. Value math is oracle-gated."""

from __future__ import annotations

import math

from ingestion_pipeline_spark.plans import query_map


def test_label_outliers_match_python(spark, sf_dir):
    """Nearest-centroid assignment recomputed in pure Python (same
    micro-unit quantization, same floor(mean) integer centroids) must
    agree row for row — EXACT integer equality, no float tolerance;
    own_d2 >= best_d2 always, equality iff not an outlier."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    counts: dict[int, int] = {}
    dim = len(emb[0]["embedding"])
    sums: dict[int, list[int]] = {}
    for r in emb:
        s = sums.setdefault(r["label"], [0] * dim)
        counts[r["label"]] = counts.get(r["label"], 0) + 1
        for i, x in enumerate(r["embedding"]):
            s[i] += math.floor(float(x) * 1_000_000)
    cents = {
        lab: [math.floor(v / counts[lab]) for v in s]
        for lab, s in sums.items()
    }

    def d2(vec, c):
        acc = 0
        for i, x in enumerate(vec):
            t = math.floor(float(x) * 1_000_000) - c[i]
            acc += t * t
        return acc

    rows = query_map()["dq_label_outliers"](spark, sf_dir).collect()
    assert len(rows) == len(emb)
    vec_by_id = {r["vec_id"]: r for r in emb}
    n_out = 0
    for r in rows:
        v = vec_by_id[r["vec_id"]]["embedding"]
        want_best = min(
            ((d2(v, c), lab) for lab, c in cents.items())
        )
        assert r["best_label"] == want_best[1]
        assert r["best_d2"] == want_best[0]
        assert r["own_d2"] == d2(v, cents[r["label"]])
        assert r["own_d2"] >= r["best_d2"]
        assert r["is_outlier"] == (r["best_label"] != r["label"])
        if r["is_outlier"]:
            n_out += 1
        else:
            assert r["own_d2"] == r["best_d2"]
    # random-ish fixture embeddings: centroids barely separate labels,
    # so outliers must exist (sanity that the flag isn't constant)
    assert 0 < n_out


def test_pmi_support_gate_and_order(spark, sf_dir):
    rows = query_map()["g_cooccurrence_pmi"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r["n_pair"] >= 5
    # returned in descending rounded-pmi order with (w1, w2) tiebreak
    keys = [(-r["pmi"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys)


def test_lateness_profile_identities(spark, sf_dir):
    rows = query_map()["w_watermark_lateness_profile"](spark, sf_dir).collect()
    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == ev_n
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_events"]
        assert r["late_share"] == round(r["n_late"] / r["n_events"], 6)
        assert 0.0 <= r["p50_late_us"] <= r["p95_late_us"] <= r["max_late_us"]
