"""BM25 keyword retrieval vs a straight-line Python reference."""

from __future__ import annotations

import math

import pytest

from ingestion_pipeline_spark.operators.search import B, K1, bm25_scores, bm25_topk

DOCS = [
    (1, "spark shuffles the table by hash"),
    (2, "the table of tables joins a table"),
    (3, "hash hash hash"),
    (4, "nothing relevant here at all"),
    (5, "Spark TABLE Hash"),  # case-folding
]
TERMS = ["spark", "table", "hash"]


def _ref_scores():
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {w: sum(1 for v in toks.values() if w in v) for w in TERMS}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for w in TERMS:
            tf = v.count(w)
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(v) / avgdl)))
        if any(w in v for w in TERMS):
            out[d] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_reference(docs):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, "text", "doc_id", TERMS).collect()}
    ref = _ref_scores()
    assert set(got) == set(ref)  # doc 4 excluded (no matching term)
    for d in ref:
        assert got[d] == pytest.approx(ref[d], rel=1e-12)


def test_topk_order_and_rank(docs):
    rows = bm25_topk(docs, "text", "doc_id", TERMS, k=3).collect()
    ref = _ref_scores()
    want = sorted(ref, key=lambda d: (-ref[d], d))[:3]
    assert [r["doc_id"] for r in rows] == want
    assert [r["rank"] for r in rows] == [1, 2, 3]
