"""Tranche-62 semantics: DSIR scores recomputed from first principles
on a slice, EG reweight laws (monotone tilt, share normalization,
power-of-two exactness), padding-waste accounting identities, and the
churn matrix's marginals against the assignment recompute.  Value math
is oracle-gated; these pin the LAWS."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map


def test_dsir_score_matches_python_recompute(spark, sf_dir):
    """Recompute the full DSIR pipeline in pure Python (hash buckets,
    add-one smoothed log ratios, sorted-fold doc scores) and assert the
    top-100 set and each score to the rounding grid."""
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()

    def toks(text):
        return [t for t in text.lower().split() if t]

    feats: list[tuple[int, str, int]] = []
    for r in docs:
        tk = toks(r["text"])
        for a, b in zip(tk, tk[1:]):
            h = hashlib.md5(f"dsir{a} {b}".encode()).hexdigest()
            feats.append((r["doc_id"], r["lang"], int(h[:8], 16) % 256))
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _, lang, b in feats:
        cr[b] = cr.get(b, 0) + 1
        if lang == "en":
            ct[b] = ct.get(b, 0) + 1
    R, T = sum(cr.values()), sum(ct.values())
    lr = {
        b: math.log2(((ct.get(b, 0) + 1) / (T + 256)) / ((c + 1) / (R + 256)))
        for b, c in cr.items()
    }
    per: dict[int, dict[int, int]] = {}
    for d, _, b in feats:
        per.setdefault(d, {})[b] = per.setdefault(d, {}).get(b, 0) + 1
    scores = {
        d: round(sum(sorted(tf * lr[b] for b, tf in bm.items())), 6)
        for d, bm in per.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [
        (r["doc_id"], r["dsir_score"])
        for r in query_map()["d_dsir_importance"](spark, sf_dir).collect()
    ]
    assert {d for d, _ in got} == {d for d, _ in want}
    want_map = dict(want)
    for d, s in got:
        assert abs(s - want_map[d]) <= 2e-6, (d, s, want_map[d])


def test_eg_reweight_laws(spark, sf_dir):
    rows = query_map()["d_eg_domain_reweight"](spark, sf_dir).collect()
    assert rows
    # weight = n_docs * 2^tilt_exp exactly; shares normalize to 1
    for r in rows:
        assert r["weight"] == r["n_docs"] * (1 << r["tilt_exp"])
        assert 0 <= r["tilt_exp"] < 8
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    # monotone: strictly higher loss never gets a lower tilt
    by_loss = sorted(rows, key=lambda r: r["loss_milli"])
    for a, b in zip(by_loss, by_loss[1:]):
        assert a["tilt_exp"] <= b["tilt_exp"]
    # the max-loss domain carries the top tilt bucket
    assert max(r["tilt_exp"] for r in rows) == by_loss[-1]["tilt_exp"]


def test_padding_waste_accounting(spark, sf_dir):
    rows = query_map()["pipeline_padding_waste"](spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs_n
    for r in rows:
        # identity: padded slots + real tokens = capacity per strategy
        assert r["bucket_pad"] + r["sum_tokens"] == r["n_docs"] * r["bucket"]
        assert r["flat_pad"] + r["sum_tokens"] == r["n_docs"] * 512
        # bucketing never pads more than flat pad-to-max
        assert r["bucket_pad"] <= r["flat_pad"]
        assert 0 <= r["bucket_waste"] <= r["flat_waste"] <= 1


def test_churn_matrix_marginals(spark, sf_dir):
    rows = query_map()["v_ivf_reassignment_churn"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in rows) == total
    for r in rows:
        moved = r["old_cell"] != r["new_cell"]
        assert r["n_moved"] == (r["n_vectors"] if moved else 0)
    # old-side marginal equals the cell-balance populations (same
    # centroids, same exact-integer assignment discipline)
    old_marg: dict[int, int] = {}
    for r in rows:
        old_marg[r["old_cell"]] = old_marg.get(r["old_cell"], 0) + r["n_vectors"]
    balance = {
        r["cluster"]: r["n_vectors"]
        for r in query_map()["v_ivf_cell_balance"](spark, sf_dir).collect()
    }
    assert old_marg == balance
