"""Dedup family tests on crafted near/exact duplicates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ingestion_pipeline_spark.operators import dedup as dd

BASE = "the quick brown fox jumps over the lazy dog again and again until done"
NEAR = BASE.replace("lazy", "sleepy")  # one token differs
OTHER = "completely different content about spark query engines and shuffles at scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "b1"),
        (2, BASE, "b1"),                  # exact dup of 1
        (3, "  The  quick brown fox jumps over the lazy dog again and again until done ", "b1"),
        (4, NEAR, "b1"),                  # near dup
        (5, OTHER, "b1"),
        (6, OTHER + " extra", "b2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, block string")


def test_exact_dup_groups(docs):
    got = {r["canonical_id"]: r["n_copies"] for r in dd.exact_dup_groups(docs, "text", "doc_id").collect()}
    # 1,2,3 normalize to the same content hash (case/whitespace)
    assert got[1] == 3
    assert got[4] == 1


def test_shingles_and_jaccard(spark, docs):
    import pytest

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.jaccard_pairs(docs, "text", "doc_id", "block", threshold=1e-9).collect()
    }
    assert pairs[(1, 2)] == 1.0                      # identical
    assert 0.5 < pairs[(1, 4)] < 1.0                 # near dup
    assert (1, 5) not in pairs                       # disjoint: J=0 never emitted
    assert (5, 6) not in pairs                       # different block
    with pytest.raises(ValueError):                  # J=0 enumeration is refused
        dd.jaccard_pairs(docs, "text", "doc_id", "block", threshold=0.0)


def test_minhash_lsh_finds_near_dups(docs):
    got = {(r["id_a"], r["id_b"]) for r in dd.minhash_lsh_candidates(docs, "text", "doc_id").collect()}
    assert (1, 2) in got            # identical always collide
    assert (1, 3) in got            # normalization-equal
    assert (1, 4) in got            # near dup shares most shingles
    assert (1, 5) not in got        # unrelated documents must not collide


def test_simhash_properties(docs):
    sigs = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", dd.simhash64(F.col("text")).alias("s")).collect()
    }
    assert len(sigs[1]) == 64 and set(sigs[1]) <= {"0", "1"}
    assert sigs[1] == sigs[2]  # identical text → identical signature
    ham_near = sum(a != b for a, b in zip(sigs[1], sigs[4]))
    ham_far = sum(a != b for a, b in zip(sigs[1], sigs[5]))
    assert ham_near < ham_far, (ham_near, ham_far)


def test_fixture_corpus_has_no_exact_dups(spark, sf_dir):
    from ingestion_pipeline_spark.sources.parquet_tables import table

    docs = table(spark, sf_dir, "documents")
    groups = dd.exact_dup_groups(docs, "text", "doc_id")
    assert groups.filter(F.col("n_copies") > 1).count() == 0


def test_containment_catches_short_inside_long(spark):
    """The measure's reason to exist: a short doc fully quoted inside a
    long one scores containment 1.0 while Jaccard stays small — and the
    contained side is identified."""
    from ingestion_pipeline_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    long_doc = filler + " " + short
    df = spark.createDataFrame(
        [(1, short, "b"), (2, long_doc, "b"), (3, "totally unrelated words here now", "b")],
        "doc_id long, text string, block string",
    )
    cont = containment_pairs(df, "text", "doc_id", "block", threshold=0.9).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_a"], r["id_b"], r["contained_id"]) == (1, 2, 1)
    assert r["containment"] == 1.0

    jac = jaccard_pairs(df, "text", "doc_id", "block", threshold=0.01).collect()
    j12 = next(x["jaccard"] for x in jac if (x["id_a"], x["id_b"]) == (1, 2))
    assert j12 < 0.1  # jaccard structurally misses it


def test_collated_grouping_matches_lowercase_dedup(spark):
    """Spark 4 collations as a dedup tool: grouping under UTF8_LCASE
    merges case variants natively — same groups as the explicit
    lower() normalization the md5 content-hash path uses, without
    materializing a normalized column."""
    df = spark.createDataFrame(
        [(1, "Fix The Bug"), (2, "fix the bug"), (3, "FIX THE BUG"), (4, "other doc")],
        "doc_id LONG, text STRING",
    )
    df.createOrReplaceTempView("cdocs")
    collated = {
        (r["n"], r["m"])
        for r in spark.sql(
            """SELECT COUNT(*) AS n, MIN(doc_id) AS m FROM cdocs
               GROUP BY COLLATE(text, 'UTF8_LCASE')"""
        ).collect()
    }
    lowered = {
        (r["n"], r["m"])
        for r in df.groupBy(F.lower("text"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("m"))
        .collect()
    }
    assert collated == lowered == {(3, 1), (1, 4)}


def test_banded_self_join_hot_split_value_identical(spark):
    """r13 LSH hot-bucket skew guard (guide §2.5): the blocked split of
    mega-buckets must yield the EXACT pair set of the plain self-join —
    every unordered pair once, including pairs that exist in both a hot
    and a cold bucket."""
    from ingestion_pipeline_spark.operators.dedup import banded_self_join_pairs

    rows = [(d, 0, 7) for d in range(20)]  # one mega-bucket (20 docs)
    rows += [(1, 1, 3), (2, 1, 3), (5, 1, 4), (30, 2, 9), (31, 2, 9), (32, 2, 9)]
    banded = spark.createDataFrame(rows, "doc long, band int, bucket long")
    plain = sorted(tuple(r) for r in banded_self_join_pairs(banded).collect())
    split = sorted(
        tuple(r)
        for r in banded_self_join_pairs(
            banded, hot_bucket_rows=4, hot_bucket_blocks=3
        ).collect()
    )
    assert split == plain
    # C(20,2) mega-bucket pairs ((1,2) deduped with the cold copy) + 3
    assert len(split) == 190 + 3
