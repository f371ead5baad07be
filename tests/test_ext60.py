"""Tranche-60 semantics: power-iteration convergence geometry, the
interval-overlap equivalence vs a brute-force theta join, and MRR
bounds tied to the recall metric. Value math is oracle-gated."""

from __future__ import annotations

import math

from ingestion_pipeline_spark.plans import query_map


def test_pca_direction_is_unit_and_converged(spark, sf_dir):
    """The returned direction must be ~unit in milli-units, and one
    MORE quantized power step applied in pure Python must leave it
    essentially unchanged (cos > 0.98: converged up to quantization),
    proving it is a fixed point of A^T A and not an artifact."""
    rows = sorted(
        query_map()["v_pca_power_iteration"](spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    v = [r["v_milli"] for r in rows]
    assert len(v) == 64
    norm = math.sqrt(sum(x * x for x in v))
    assert abs(norm - 1000.0) < 35.0, norm  # unit up to quantization grid
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    m = [[math.floor(float(x) * 1000) for x in r["embedding"]] for r in emb]
    u = [sum(mi[i] * v[i] for i in range(64)) for mi in m]
    w = [sum(m[r][i] * u[r] for r in range(len(m))) for i in range(64)]
    wn = math.sqrt(sum(float(x) * float(x) for x in w))
    v2 = [1000.0 * x / wn for x in w]
    cos = sum(a * b for a, b in zip(v, v2)) / (
        math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in v2))
    )
    assert cos > 0.98, cos
    for r in rows:
        assert r["component"] == round(r["v_milli"] / 1000.0, 6)


def test_interval_overlap_matches_theta_join(spark, sf_dir):
    """The bucketed equi-join must return EXACTLY the pairs a
    brute-force per-user theta join over the same session intervals
    returns — no pair lost at bucket boundaries, no dupe kept."""
    rows = query_map()["j_interval_overlap_join"](spark, sf_dir).collect()
    got = {
        (r["user_id"], r["a_id"], r["b_id"]): r["overlap_us"] for r in rows
    }
    assert len(got) == len(rows), "pair key must be unique"
    # rebuild sessions in Python straight from the raw events
    import collections

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    gap = 48 * 3600 * 1_000_000

    def sessions(etype):
        per_user = collections.defaultdict(list)
        for e in ev:
            if e["event_type"] == etype:
                us = int(e["ts"].timestamp() * 1_000_000)
                per_user[e["user_id"]].append((us, e["event_id"]))
        out = collections.defaultdict(list)  # user -> [(sid, start, end)]
        for u, ts in per_user.items():
            ts.sort()
            sid = 0
            for i, (t, _) in enumerate(ts):
                if i == 0 or t - ts[i - 1][0] > gap:
                    sid += 1
                    out[u].append([sid, t, t])
                else:
                    out[u][-1][2] = t
        return out

    a, b = sessions("click"), sessions("purchase")
    want = {}
    for u in set(a) & set(b):
        for sa, s1, e1 in a[u]:
            for sb, s2, e2 in b[u]:
                if s1 <= e2 and s2 <= e1:
                    want[(u, sa, sb)] = min(e1, e2) - max(s1, s2)
    assert got == want


def test_mrr_bounds_and_rank_consistency(spark, sf_dir):
    rows = query_map()["e_retrieval_mrr"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["lsh_rank"] <= 10
        if r["lsh_rank"] == 0:
            assert r["reciprocal_rank"] == 0.0
        else:
            assert r["reciprocal_rank"] == 1.0 / r["lsh_rank"]
        assert r["true_top1"] != r["probe_id"], "self-match must be excluded"
