"""Tranche-63 semantics: tokenizer-fertility accounting vs the pinned
BPE per-doc counts, token-budget arithmetic laws, vocab-overlap set
identities against a pure-Python recompute, and calibration-bin
accounting.  Value math is oracle-gated; these pin the LAWS."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map


def test_fertility_matches_per_doc_bpe_counts(spark, sf_dir):
    """The per-lang rollup must equal aggregating tx_bpe_tokenize's
    per-doc counts (shared tokenizer, lang carried through vs joined)."""
    fert = {
        r["lang"]: (r["n_docs"], r["sum_words"], r["sum_bpe_tokens"])
        for r in query_map()["tx_tokenizer_fertility"](spark, sf_dir).collect()
    }
    per_doc = query_map()["tx_bpe_tokenize"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    want = {
        r["lang"]: (r["n"], r["w"], r["t"])
        for r in per_doc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_words").alias("w"),
            F.sum("n_bpe_tokens").alias("t"),
        )
        .collect()
    }
    assert fert == want
    # fertility >= 1 wherever words exist (a word is >= 1 BPE token);
    # zh has no [a-z]+ words -> the 0.0 sentinel
    for r in query_map()["tx_tokenizer_fertility"](spark, sf_dir).collect():
        if r["sum_words"] > 0:
            assert r["fertility"] >= 1.0
            assert r["sum_bpe_tokens"] >= r["sum_words"]
        else:
            assert r["fertility"] == 0.0 and r["sum_bpe_tokens"] == 0


def test_token_budget_laws(spark, sf_dir):
    rows = query_map()["pipeline_token_budget"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    alloc = 4 * total // len(rows)
    for r in rows:
        assert r["alloc_tokens"] == alloc
        # ceil-div epochs, capped at 4
        want_epochs = min(-(-alloc // r["n_tokens"]), 4)
        assert r["epochs_used"] == want_epochs
        assert r["usable_tokens"] == min(alloc, 4 * r["n_tokens"])
        assert r["deficit_tokens"] == alloc - r["usable_tokens"]
        assert r["deficit_tokens"] >= 0
        # deficit happens iff the source runs out of unique data at cap
        assert (r["deficit_tokens"] > 0) == (4 * r["n_tokens"] < alloc)
        assert 0 < r["fill_rate"] <= 1.0


def test_vocab_overlap_matches_python_recompute(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts: dict[str, Counter] = {}
    for r in docs:
        counts.setdefault(r["source"], Counter()).update(
            t for t in r["text"].lower().split() if t
        )
    vocab = {
        s: {
            t
            for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
        }
        for s, c in counts.items()
    }
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_inter"],
            r["n_vocab_a"],
            r["n_vocab_b"],
        )
        for r in query_map()["g_vocab_overlap"](spark, sf_dir).collect()
    }
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in got
            else:
                assert got[(a, b)] == (inter, len(vocab[a]), len(vocab[b]))


def test_calibration_bins_accounting(spark, sf_dir):
    rows = query_map()["e_calibration_bins"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["n_pos"] for r in rows) == docs.filter(
        F.col("lang") == "en"
    ).count()
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert abs(r["pos_rate"] - r["n_pos"] / r["n_docs"]) < 1e-6
    # full pure-Python recompute of the binning (the fixture's text is
    # lang-INDEPENDENT word soup, so no separation law holds — the
    # table's job is precisely to expose that: pos_rate stays near the
    # base rate in every populated bin, i.e. the score is uninformative
    # on this corpus; on real multilingual text the same query shows
    # the rising profile e_threshold_sweep assumes)
    markers = {"the", "and", "of", "is"}
    want: dict[int, list[int]] = {}
    for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        hits = sum(
            1 for t in d["text"].lower().split() if t and t in markers
        )
        b = min(hits, 9)
        cur = want.setdefault(b, [0, 0])
        cur[0] += 1
        cur[1] += 1 if d["lang"] == "en" else 0
    got = {r["bin"]: [r["n_docs"], r["n_pos"]] for r in rows}
    assert got == want
