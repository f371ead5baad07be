"""Tranche-61 semantics: kappa recomputed from the confusion matrix,
cell-balance accounting, curriculum layout laws, and the boundary-set
identity against a pure-Python recompute. Value math is oracle-gated."""

from __future__ import annotations

import math

from ingestion_pipeline_spark.plans import query_map


def test_kappa_matches_confusion_matrix(spark, sf_dir):
    """kappa recomputed from dq_langid_confusion's own counts (same
    prediction path) must match to the rounding grid."""
    conf = query_map()["dq_langid_confusion"](spark, sf_dir).collect()
    n = sum(r["n"] for r in conf)
    d = sum(r["n"] for r in conf if r["true_lang"] == r["predicted_lang"])
    rowt: dict[str, int] = {}
    colt: dict[str, int] = {}
    for r in conf:
        rowt[r["true_lang"]] = rowt.get(r["true_lang"], 0) + r["n"]
        colt[r["predicted_lang"]] = colt.get(r["predicted_lang"], 0) + r["n"]
    s = sum(rowt[c] * colt[c] for c in set(rowt) & set(colt))
    po, pe = d / n, s / (n * n)
    row = query_map()["e_annotator_agreement"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == n
    assert abs(row["po"] - po) <= 1e-6
    assert abs(row["pe"] - pe) <= 1e-6
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) <= 1e-5


def test_cell_balance_accounting(spark, sf_dir):
    rows = query_map()["v_ivf_cell_balance"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in rows) == total
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    imb = {r["imbalance_factor"] for r in rows}
    assert len(imb) == 1, "imbalance factor is a global scalar"
    mx = max(r["n_vectors"] for r in rows)
    assert abs(imb.pop() - mx * 16 / total) <= 1e-6
    assert all(r["imbalance_factor"] >= 1.0 for r in rows)


def test_cell_balance_assignment_exact_integer(spark, sf_dir):
    """The quantized argmax assignment (Arrow matmul) must equal a
    pure-Python exact-integer recompute of the oracle's fold: quantize
    to floor(x*1e5), exact int dots, score = dot / sqrt(||c||^2), ties
    to lowest cid.  Guards the dq_label_outliers-style discipline that
    makes the value hash engine-independent."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()

    def q(v):
        return [math.floor(float(x) * 100000.0) for x in v]

    cents = {
        r["vec_id"]: q(r["embedding"]) for r in emb if r["vec_id"] < 16
    }
    norms = {
        cid: math.sqrt(sum(c * c for c in cv)) for cid, cv in cents.items()
    }
    counts: dict[int, int] = {}
    for r in emb:
        vq = q(r["embedding"])
        best = min(
            (
                (-sum(a * b for a, b in zip(vq, cv)) / norms[cid], cid)
                for cid, cv in cents.items()
            )
        )[1]
        counts[best] = counts.get(best, 0) + 1
    got = {
        r["cluster"]: r["n_vectors"]
        for r in query_map()["v_ivf_cell_balance"](spark, sf_dir).collect()
    }
    assert got == counts


def test_curriculum_order_layout(spark, sf_dir):
    """Every doc appears once; positions are contiguous 1..|bucket|
    within each bucket; buckets span 1..10; identical across runs."""
    q = query_map()["pipeline_curriculum_order"]
    rows = q(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs_n
    assert len({r["doc_id"] for r in rows}) == docs_n
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        assert 1 <= r["bucket"] <= 10
        by_bucket.setdefault(r["bucket"], []).append(r["pos"])
    for b, poss in by_bucket.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), b
    again = {(r["doc_id"], r["bucket"], r["pos"]) for r in q(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["bucket"], r["pos"]) for r in rows}


def test_margin_boundary_set_matches_python(spark, sf_dir):
    rows = query_map()["s_active_learning_margin"](spark, sf_dir).collect()
    assert len(rows) == 100
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    scores = {
        r["vec_id"]: sum(math.floor(float(x) * 1000) for x in r["embedding"])
        for r in emb
    }
    lo, hi = min(scores.values()), max(scores.values())
    # Spark/DuckDB `div` truncates toward zero; Python // floors —
    # mirror truncation for possibly-negative midpoints
    t = int((lo + hi) / 1)  # noqa: keep ints
    t = (lo + hi) // 2 if (lo + hi) >= 0 else -((-(lo + hi)) // 2)
    want = sorted(
        ((abs(s - t), vid) for vid, s in scores.items())
    )[:100]
    got = [(r["margin"], r["vec_id"]) for r in rows]
    assert sorted(got) == want
    for r in rows:
        assert r["margin"] == abs(r["score_milli"] - t)
