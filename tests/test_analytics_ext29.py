"""Invariant tests for the ext29 tranche: cohort retention identities,
chunk-overlap reconstruction, duplicate-span brute-force identity,
profiler bounds, and a Python triangle-count recompute. Value-level
correctness is covered by the DuckDB oracle gate; these assert the
semantic properties the oracle hash can't express.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map


def test_cohort_retention_identities(spark, sf_dir):
    rows = query_map()["w_cohort_retention"](spark, sf_dir).collect()
    assert rows
    n_users_total = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    cohort_sizes: dict[int, int] = {}
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0.0 < r["retention"] <= 1.0
        assert r["n_active"] <= r["cohort_size"]
        cohort_sizes[r["cohort_wk"]] = r["cohort_size"]
        if r["week_offset"] == 0:
            # everyone is active in the week of their first event
            assert r["n_active"] == r["cohort_size"]
    # cohorts partition the user base
    assert sum(cohort_sizes.values()) == n_users_total


def test_chunk_overlap_reconstructs_documents(spark, sf_dir):
    chunks = query_map()["tx_chunk_overlap"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = defaultdict(list)
    for c in chunks:
        assert c["chunk_start"] == 150 * c["chunk_idx"]
        assert c["chunk_len"] == len(c["chunk_text"]) <= 200
        by_doc[c["doc_id"]].append(c)
    for doc_id, text in docs.items():
        if not text:
            assert doc_id not in by_doc
            continue
        got = sorted(by_doc[doc_id], key=lambda c: c["chunk_idx"])
        # exact cover count: one chunk per stride
        assert len(got) == (len(text) + 149) // 150
        # stitching non-overlapping prefixes reconstructs the document
        stitched = "".join(c["chunk_text"][:150] for c in got[:-1])
        stitched += got[-1]["chunk_text"]
        assert stitched == text
        # consecutive chunks agree on their 50-char overlap
        for a, b in zip(got, got[1:]):
            assert a["chunk_text"][150:] == b["chunk_text"][: len(a["chunk_text"]) - 150]


def test_duplicate_spans_match_bruteforce(spark, sf_dir):
    out = {
        r["span_md5"]: (r["n_occurrences"], r["n_docs"], r["min_doc"], r["max_doc"])
        for r in query_map()["d_duplicate_spans"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    occ: dict[str, list[int]] = defaultdict(list)
    for r in docs:
        text = r["text"]
        for off in range(0, len(text) - 63, 32):
            span = text[off : off + 64]
            occ[hashlib.md5(span.encode()).hexdigest()].append(r["doc_id"])
    expect = {
        h: (len(ids), len(set(ids)), min(ids), max(ids))
        for h, ids in occ.items()
        if len(set(ids)) >= 2
    }
    assert out == expect


def test_numeric_profile_bounds(spark, sf_dir):
    rows = {r["column_name"]: r for r in query_map()["dq_numeric_profile"](spark, sf_dir).collect()}
    assert set(rows) == {"o_totalprice", "o_custkey"}
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]
        assert r["min_value"] <= r["mean_value"] <= r["max_value"]


def test_triangle_counts_match_python(spark, sf_dir):
    edges = {
        (r["id_a"], r["id_b"])
        for r in query_map()["d_embedding_near_dups"](spark, sf_dir).collect()
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)  # canonical orientation a < b
    expect_tri = sum(
        1 for a, b in edges for c in adj[b] if c in adj[a]
    )
    nodes = {x for e in edges for x in e}
    row = query_map()["g_triangle_counts"](spark, sf_dir).collect()[0]
    assert row["n_triangles"] == expect_tri
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(nodes)
