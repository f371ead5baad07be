"""Pure-Python recompute / law tests for the ext66 tranche (round 12):
the capped production triangle census — the same independent-recompute
discipline as test_ext65, sharing its cascade/edge helpers so the edge
rule has ONE Python recompute across every capped-query test.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import duckdb

from test_ext65 import (
    _cascade_recompute,
    _guard_corpus_docs,
    _verified_edges,
    _write_docs_fixture,
)


def test_edge_cte_composition_stable():
    """The r12 refactor rebuilt _EDGE_COMP_CTES from the standalone
    _ED_CTE/_EXC_CTE constants so ext66 can share the edge rule; the
    two r11-graded capped queries' oracle SQL must stay byte-identical.
    Pin: composition property + md5 of the composed block at its
    r11-graded value (an INTENTIONAL edge-rule change updates the hash
    here and re-pins all three capped queries into the next window)."""
    from ingestion_pipeline_spark.plans import registry_ext65 as e65

    assert e65._ED_CTE in e65._EDGE_COMP_CTES
    assert e65._EXC_CTE in e65._EDGE_COMP_CTES
    assert (
        hashlib.md5(e65._EDGE_COMP_CTES.encode()).hexdigest()
        == "4bf5057371d41a5fda568f2c717376fb"
    )
    # and the new tranche really rides the same constants
    from ingestion_pipeline_spark.plans import REGISTRY

    sql = REGISTRY["g_triangle_census_capped"].sql
    assert e65._ED_CTE in sql and e65._EXC_CTE in sql


def _triangle_corpus_docs():
    """The guard corpus (hot 40-doc star family + unrelated docs +
    exact dups) EXTENDED with a 3-doc near-identical clique family
    whose bucket stays under _ENUM_CAP — so the census sees both
    shapes at once: star wedges that do NOT close (the guarded family
    pairs only against its min-id representative) and a genuine
    triangle from full C(3,2) enumeration."""
    docs, fam = _guard_corpus_docs()
    base2 = " ".join(f"tri{i}" for i in range(120))
    nxt = max(d for d, _ in docs) + 1
    clique = [(nxt + j, f"{base2} tail{j}") for j in range(3)]
    return docs + clique, fam, [d for d, _ in clique]


def _census_recompute(edges):
    """Independent triangle/wedge census: adjacency over the canonical
    (a < b) verified edges, triangles by neighbor-set intersection,
    wedges as sum C(deg, 2). (Derived entirely from the edge list —
    the census covers every edge endpoint, not the survivor set.)"""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        assert a < b, "cascade edges must be canonically oriented"
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = sum(
        1
        for a in adj
        for b, c in combinations(sorted(n for n in adj[a] if n > a), 2)
        if c in adj[b]
    )
    degs = [len(v) for v in adj.values()]
    n_wedges = sum(d * (d - 1) // 2 for d in degs)
    return {
        "n_triangles": n_tri,
        "n_edges": len(edges),
        "n_nodes": len(adj),
        "n_wedges": n_wedges,
        "max_degree": max(degs, default=0),
        "closure_bp": (n_tri * 3 * 10000) // n_wedges if n_wedges else 0,
    }


def test_triangle_census_capped_recompute(spark, tmp_path):
    """g_triangle_census_capped on the clique-extended guard corpus:
    edges recomputed from first principles (the shared _verified_edges
    rule), census recomputed via adjacency sets, both the Spark result
    and the DuckDB oracle checked against it field by field."""
    from ingestion_pipeline_spark.plans import REGISTRY

    docs, _fam, clique_ids = _triangle_corpus_docs()
    sf_dir = _write_docs_fixture(tmp_path, docs)

    _survivors, _drops, n_guarded, _ob, _obu, cands, shs = (
        _cascade_recompute(docs, return_cands=True)
    )
    edges, n_excluded = _verified_edges(cands, shs)
    want = _census_recompute(edges)
    # the corpus must actually exercise both shapes
    assert want["n_triangles"] >= 1, "clique family must close a triangle"
    assert want["n_wedges"] > 3 * want["n_triangles"], (
        "star family must contribute unclosed wedges"
    )
    a, b, c = sorted(clique_ids)
    assert {(a, b), (a, c), (b, c)} <= set(edges)
    assert n_guarded >= 1

    row = (
        REGISTRY["g_triangle_census_capped"].spark(spark, sf_dir).collect()
    )
    assert len(row) == 1
    got = row[0].asDict()
    assert got == {
        **want,
        "excluded_pairs": n_excluded,
        "guarded_buckets": n_guarded,
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    ocols = [d[0] for d in con.execute(
        REGISTRY["g_triangle_census_capped"].sql
    ).description]
    orow = con.execute(REGISTRY["g_triangle_census_capped"].sql).fetchall()
    assert len(orow) == 1
    assert dict(zip(ocols, orow[0])) == got


def test_triangle_census_capped_empty_graph(spark, tmp_path):
    """Zero verified edges (all-distinct corpus): every count is 0,
    closure_bp guard does not divide by zero, and the single row still
    carries the censuses — on BOTH the Spark and oracle sides."""
    from ingestion_pipeline_spark.plans import REGISTRY

    docs = [
        (i + 1, " ".join(f"d{i}w{j}" for j in range(40))) for i in range(12)
    ]
    sf_dir = _write_docs_fixture(tmp_path, docs)
    row = (
        REGISTRY["g_triangle_census_capped"].spark(spark, sf_dir).collect()
    )
    assert len(row) == 1
    zero = {
        "n_triangles": 0, "n_edges": 0, "n_nodes": 0, "n_wedges": 0,
        "max_degree": 0, "closure_bp": 0, "excluded_pairs": 0,
        "guarded_buckets": 0,
    }
    assert row[0].asDict() == zero
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    orow = con.execute(REGISTRY["g_triangle_census_capped"].sql).fetchall()
    assert len(orow) == 1 and list(orow[0]) == [0] * 8


def test_lpa_communities_capped_recompute(spark, tmp_path):
    """d_lpa_communities_capped on the clique-extended guard corpus:
    density communities over the verified edges — the 40-doc star
    family is one community, the 3-doc clique another, and the Spark
    result matches the DuckDB unrolled-rounds oracle row for row."""
    from ingestion_pipeline_spark.plans import REGISTRY

    docs, fam, clique_ids = _triangle_corpus_docs()
    sf_dir = _write_docs_fixture(tmp_path, docs)
    rows = (
        REGISTRY["d_lpa_communities_capped"].spark(spark, sf_dir).collect()
    )
    got = {r["doc_id"]: r["community"] for r in rows}
    # star family members present in the graph share doc 1's community
    star = [d for d in got if d <= fam]
    assert star and all(got[d] == got[1] for d in star)
    # the clique is one community, distinct from the star's
    a, b, c = clique_ids
    assert got[a] == got[b] == got[c] == a
    assert got[a] != got[1]
    # censuses ride every row
    assert {(r["excluded_pairs"], r["guarded_buckets"]) for r in rows} == {
        (rows[0]["excluded_pairs"], rows[0]["guarded_buckets"])
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            REGISTRY["d_lpa_communities_capped"].sql
        ).fetchall()
    }
    assert {
        r["doc_id"]: (r["community"], r["excluded_pairs"], r["guarded_buckets"])
        for r in rows
    } == oracle


def test_ppr_capped_seed_concentration(spark, tmp_path):
    """d_personalized_pagerank_capped on a corpus whose clique family
    contains the ONLY seed (doc 100): restart mass stays inside the
    clique's component, the star family (unreachable from the seed)
    is rank-0 and filtered on both sides, and Spark matches the
    unrolled oracle bit for bit."""
    from ingestion_pipeline_spark.plans import REGISTRY

    docs, _fam = _guard_corpus_docs()
    base2 = " ".join(f"tri{i}" for i in range(120))
    clique = [(d, f"{base2} tail{d}") for d in (100, 101, 102)]
    sf_dir = _write_docs_fixture(tmp_path, docs + clique)

    rows = (
        REGISTRY["d_personalized_pagerank_capped"]
        .spark(spark, sf_dir)
        .collect()
    )
    got = {r["doc_id"]: r["rank_fp"] for r in rows}
    # only the clique's component is reachable from seed 100
    assert set(got) == {100, 101, 102}
    # the seed holds the restart mass: strictly top-ranked
    assert got[100] > got[101] and got[100] > got[102]
    # fixed-point ranks are exactly reproducible: oracle bit-parity
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            REGISTRY["d_personalized_pagerank_capped"].sql
        ).fetchall()
    }
    assert {
        r["doc_id"]: (
            r["rank_fp"], r["rank"], r["excluded_pairs"],
            r["guarded_buckets"],
        )
        for r in rows
    } == oracle


def test_ppr_capped_no_seeds_empty(spark, tmp_path):
    """No graph node divisible by 50 -> zero seeds: the operator
    returns 0 rows (all ranks zero, filtered) and the oracle agrees
    instead of dividing by zero — the degenerate release shape."""
    from ingestion_pipeline_spark.plans import REGISTRY

    base2 = " ".join(f"tri{i}" for i in range(120))
    docs = [(d, f"{base2} tail{d}") for d in (1, 2, 3)]
    sf_dir = _write_docs_fixture(tmp_path, docs)
    assert (
        REGISTRY["d_personalized_pagerank_capped"]
        .spark(spark, sf_dir)
        .count()
        == 0
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    assert (
        con.execute(REGISTRY["d_personalized_pagerank_capped"].sql).fetchall()
        == []
    )
