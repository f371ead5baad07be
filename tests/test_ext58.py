"""Tranche-58 semantics: vocab-boundary determinism for OOV rates, the
langid-confusion accounting identity, temperature-mixture math against
a pure-Python reference, and the packing-sweep monotonicity the oracle
can't state. Value math itself is oracle-gated."""

from __future__ import annotations

import math

from ingestion_pipeline_spark.plans import query_map


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_oov_rate_hand_computed(spark, tmp_path, monkeypatch):
    """With the vocab cap shrunk to 2: corpus 'a a a b b c' -> vocab
    {a, b} (count desc), so source s1='a a a b' has 0 OOV and
    s2='b c' has 1 of 2 OOV."""
    from ingestion_pipeline_spark.plans import registry_ext58 as ext

    monkeypatch.setattr(ext, "_VOCAB_K", 2)
    _write_docs(
        spark,
        str(tmp_path),
        [("a a a b", "en", "s1"), ("b c", "en", "s2")],
    )
    # rebuild the query against the patched cap (the registered closure
    # captured the module constant at import, so call the fn directly)
    out = {r["source"]: r for r in ext.tx_oov_rate(spark, str(tmp_path)).collect()}
    assert out["s1"]["n_tokens"] == 4 and out["s1"]["n_oov"] == 0
    assert out["s2"]["n_tokens"] == 2 and out["s2"]["n_oov"] == 1
    assert out["s2"]["oov_rate"] == 0.5


def test_langid_confusion_shares_sum_to_one(spark, sf_dir):
    rows = query_map()["dq_langid_confusion"](spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == docs_n, "every doc lands in one cell"
    by_true: dict[str, float] = {}
    for r in rows:
        by_true[r["true_lang"]] = by_true.get(r["true_lang"], 0.0) + r["share"]
    for lang, s in by_true.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_temperature_mixture_matches_python(spark, sf_dir):
    """alpha=0.5 weights recomputed in pure Python from the corpus
    token counts must match to the 1e-6 rounding grid; weights sum to
    ~1 and upweight small sources (weight_i/p_i grows as p_i falls)."""
    rows = query_map()["d_temperature_mixture"](spark, sf_dir).collect()
    n = {r["source"]: r["n_tokens"] for r in rows}
    big_n = sum(n.values())
    z = sum(math.sqrt(n[s] / big_n) for s in sorted(n))
    for r in rows:
        want = math.sqrt(n[r["source"]] / big_n) / z
        assert abs(r["weight"] - round(want, 6)) <= 1e-6
        assert r["expected_tokens"] == math.floor(want * big_n + 0.5)
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    # monotone: more tokens -> more weight, but sublinearly
    srt = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(srt, srt[1:]):
        if a["n_tokens"] < b["n_tokens"]:
            assert a["weight"] <= b["weight"]
            assert a["weight"] / (a["n_tokens"] / big_n) >= b["weight"] / (
                b["n_tokens"] / big_n
            ) - 1e-9


def test_context_sweep_monotonicity(spark, sf_dir):
    """Longer contexts -> no more sequences, and total_tokens is
    invariant across the sweep; waste matches its own definition."""
    rows = sorted(
        query_map()["pipeline_context_length_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["ctx_len"],
    )
    assert [r["ctx_len"] for r in rows] == [256, 512, 1024, 2048]
    assert len({r["total_tokens"] for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert a["n_seqs"] >= b["n_seqs"]
    for r in rows:
        assert r["padded_tokens"] == r["n_seqs"] * r["ctx_len"]
        assert r["waste_rate"] == round(
            (r["padded_tokens"] - r["total_tokens"]) / r["padded_tokens"], 6
        )
