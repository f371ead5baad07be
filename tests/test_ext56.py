"""Tranche-56 semantics: boilerplate-prune policy (keep-NO-occurrence,
vs ext50's keep-first), a hand-computed bigram-perplexity identity on a
synthetic corpus, and the threshold-sweep confusion invariants. The
value math itself is oracle-gated; these assert the guarantees the
oracle can't express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map


def _write_docs(spark, path, texts):
    rows = [
        (i, t, "en", "src", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_boilerplate_drops_every_occurrence(spark, tmp_path):
    """A segment shared by >=3 docs must vanish from ALL of them —
    including the first — while unique tails survive. This is the
    policy line between boilerplate removal and keep-first chunk
    dedup (tx_dedup_chunks_rebuild keeps occurrence #1)."""
    shared = "alpha beta gamma delta epsilon"  # exactly one 5-token segment
    texts = [
        f"{shared} unique0 u0b u0c u0d u0e",
        f"{shared} unique1 u1b u1c u1d u1e",
        f"{shared} unique2 u2b u2c u2d u2e",
        "solo text without any repeats here extra words fill ten",
    ]
    _write_docs(spark, str(tmp_path), texts)
    out = {
        r["doc_id"]: r
        for r in query_map()["tx_boilerplate_prune"](
            spark, str(tmp_path)
        ).collect()
    }
    for i in range(3):
        assert "alpha" not in out[i]["text_clean"], "shared segment must go"
        assert f"unique{i}" in out[i]["text_clean"], "unique tail must stay"
        assert out[i]["n_segments"] == 2 and out[i]["n_dropped"] == 1
    # the un-shared doc is untouched
    assert out[3]["n_dropped"] == 0
    assert out[3]["text_clean"] == texts[3]
    # accounting identity: kept segments == tokens remaining / segment
    for r in out.values():
        kept_tokens = len([t for t in r["text_clean"].split(" ") if t])
        # every fixture doc splits into exact 5-token segments
        assert kept_tokens == (r["n_segments"] - r["n_dropped"]) * 5


def test_bigram_perplexity_hand_computed(spark, tmp_path):
    """Tiny-corpus identity: doc0='a b a b', doc1='a b', doc2='x'.
    Unigrams a:3 b:3 x:1 (V=3); bigrams (a,b):3 (b,a):1.
    p(a,b)=(3+1)/(3+3)=2/3, p(b,a)=(1+1)/(3+3)=1/3.
    doc0 mean = (2*-log2(2/3) + 1*-log2(1/3))/3; doc1 = -log2(2/3);
    doc2 has no bigrams and must drop out entirely."""
    _write_docs(spark, str(tmp_path), ["a b a b", "a b", "x"])
    rows = {
        r["doc_id"]: r
        for r in query_map()["tx_bigram_perplexity"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {0, 1}, "a 1-token doc has no bigrams"
    t_ab = -math.log2((3 + 1) / (3 + 3.0))
    t_ba = -math.log2((1 + 1) / (3 + 3.0))
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["mean_surprisal"] == round(
        (sorted([2 * t_ab, t_ba])[0] + sorted([2 * t_ab, t_ba])[1]) / 3.0, 6
    )
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["mean_surprisal"] == round(t_ab, 6)


def test_epoch_shuffle_is_a_permutation(spark, sf_dir):
    """(shard, pos) must be a proper permutation layout: every doc
    appears exactly once, positions within each shard are contiguous
    1..n, and the assignment is identical across runs (pure function
    of doc_id — no RNG, no partitioning dependence)."""
    q = query_map()["pipeline_epoch_shuffle"]
    a = q(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(a) == docs_n
    assert len({r["doc_id"] for r in a}) == docs_n
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic across runs
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in q(spark, sf_dir).collect()}
    assert b == {(r["doc_id"], r["shard"], r["pos"]) for r in a}


def test_threshold_sweep_invariants(spark, sf_dir):
    rows = sorted(
        query_map()["e_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert len(rows) == 10
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_pos = emb.filter(F.col("label") >= 5).count()
    prev_recall = 1.1
    for r in rows:
        # confusion identity: every positive is either caught or missed
        assert r["tp"] + r["fn"] == n_pos
        # recall is monotone non-increasing as the threshold rises
        assert r["recall"] <= prev_recall + 1e-12
        prev_recall = r["recall"]
        assert 0.0 <= r["precision"] <= 1.0
    # the lowest threshold (== global min) keeps every positive
    assert rows[0]["recall"] == 1.0
