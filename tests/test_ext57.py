"""Tranche-57 semantics: FIM reassembly identity, preference-pair
champion/margin invariants, a hand-computed diversity identity, and the
whitening guarantee (z-stats are 0/1 by construction). The value math
is oracle-gated; these assert the guarantees the oracle can't express."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map

_FIM_RE = re.compile(r"^<PRE>(.*)<SUF>(.*)<MID>(.*)$", re.DOTALL)


def test_fim_reassembles_to_original(spark, sf_dir):
    """PSM reorder must be lossless: prefix+middle+suffix == text, the
    cut points bound the pieces exactly, and the transform is
    deterministic across runs (pure function of doc_id/text)."""
    q = query_map()["x_fim_transform"]
    out = {r["doc_id"]: r for r in q(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        r = out[doc_id]
        m = _FIM_RE.match(r["fim_text"])
        assert m, r["fim_text"][:80]
        prefix, suffix, middle = m.groups()
        assert prefix + middle + suffix == text
        assert len(prefix) == r["cut_lo"]
        assert len(prefix) + len(middle) == r["cut_hi"]
        assert 0 <= r["cut_lo"] <= r["cut_hi"] <= len(text)
    again = {r["doc_id"]: r["fim_text"] for r in q(spark, sf_dir).collect()}
    assert again == {k: v["fim_text"] for k, v in out.items()}


def test_preference_pairs_champion_and_margin(spark, sf_dir):
    """The chosen doc must be the group's true argmax under
    (score, doc_id) — ties broken by the LARGER doc_id — and every
    pair must clear the margin; the champion never pairs with itself."""
    rows = query_map()["s_preference_pairs"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    scores: dict[tuple, dict[int, int]] = {}
    for d in docs:
        toks = [t for t in d["text"].lower().split() if t]
        scores.setdefault((d["source"], d["lang"]), {})[d["doc_id"]] = len(toks)
    assert rows, "fixture corpus must produce at least one pair"
    for r in rows:
        group = scores[(r["source"], r["lang"])]
        best = max(group.items(), key=lambda kv: (kv[1], kv[0]))
        assert r["chosen_id"] == best[0]
        assert r["rejected_id"] != r["chosen_id"]
        assert r["margin"] >= 8
        assert r["margin"] == best[1] - group[r["rejected_id"]]


def _write_docs(spark, path, texts):
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_ngram_diversity_hand_computed(spark, tmp_path):
    """One source, docs 'a b a' + 'a b': tokens=5, types=2 (ttr=0.4);
    bigrams = [a b, b a] + [a b] -> 3 total, 2 distinct (ratio 2/3)."""
    _write_docs(spark, str(tmp_path), ["a b a", "a b"])
    rows = query_map()["g_ngram_diversity"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_tokens"] == 5 and r["n_types"] == 2
    assert r["ttr"] == 0.4
    assert r["n_bigrams"] == 3 and r["n_bigram_types"] == 2
    assert r["bigram_diversity"] == round(2 / 3.0, 6)


def test_standardize_dims_zero_mean_unit_std(spark, sf_dir):
    """Whitening must actually whiten: decoded z columns have mean ~0
    and std ~1 per dimension (exactly, up to the 1e-6 fixed-point
    grid), and every vector keeps its full dimensionality."""
    rows = query_map()["v_standardize_dims"](spark, sf_dir).collect()
    zs = [[int(v) / 1e6 for v in r["z_fixed"].split(",")] for r in rows]
    dims = {len(z) for z in zs}
    assert dims == {len(zs[0])}, "all vectors share one dimensionality"
    n = len(zs)
    for d in range(len(zs[0])):
        col = [z[d] for z in zs]
        mean = sum(col) / n
        var = sum(v * v for v in col) / n - mean * mean
        assert abs(mean) < 1e-4, (d, mean)
        assert abs(math.sqrt(var) - 1.0) < 1e-3, (d, var)
