"""Exact-value pins for the r12 graph-iteration refactor.

Round 12 rewrote the per-round join shape of ``pagerank_fixed_point``,
``personalized_pagerank_fixed_point`` and ``label_propagation`` (degree
attached to the static edge frame once; the redundant per-round node
left-join dropped on symmetrized graphs; LPA's window argmax replaced
by an aggregate argmin of ``(-count, label)``). The arithmetic contract
must be BIT-IDENTICAL — these queries are value-hash-gated against
unrolled DuckDB CTEs — so this module replays the exact integer
recurrences in pure Python on a fixture graph with every interesting
shape (star, clique, chain, bridge, isolated pair) and asserts
equality, not proximity.
"""

from __future__ import annotations

from collections import defaultdict

from ingestion_pipeline_spark.operators.graph import (
    PR_SCALE,
    label_propagation,
    pagerank_fixed_point,
    personalized_pagerank_fixed_point,
)

# star(0;1-4) + clique(10,11,12) + chain 20-21-22-23 + bridge 4-10 +
# isolated pair (30,31)
EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4),
    (10, 11), (10, 12), (11, 12),
    (20, 21), (21, 22), (22, 23),
    (4, 10),
    (30, 31),
]


def _sym(edges):
    return edges + [(b, a) for a, b in edges]


def _ref_pagerank_fp(edges, iters=10):
    sym = _sym(edges)
    nodes = sorted({n for e in sym for n in e})
    deg = defaultdict(int)
    for s, _ in sym:
        deg[s] += 1
    n_total = len(nodes)
    init = PR_SCALE // n_total
    base = (15 * PR_SCALE) // (100 * n_total)
    r = {n: init for n in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for s, d in sym:
            contrib[d] += r[s] // deg[s]
        r = {n: base + (85 * contrib[n]) // 100 for n in nodes}
    return r


def _ref_ppr_fp(edges, seed_list, iters=10):
    sym = _sym(edges)
    nodes = sorted({n for e in sym for n in e})
    seeds = [s for s in seed_list if s in nodes]
    deg = defaultdict(int)
    for s, _ in sym:
        deg[s] += 1
    n_seeds = len(seeds)
    init = PR_SCALE // n_seeds
    base = (15 * PR_SCALE) // (100 * n_seeds)
    is_seed = {n: 1 if n in seeds else 0 for n in nodes}
    r = {n: is_seed[n] * init for n in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for s, d in sym:
            contrib[d] += r[s] // deg[s]
        r = {n: is_seed[n] * base + (85 * contrib[n]) // 100 for n in nodes}
    return r


def _ref_lpa(edges, iters=4):
    sym = _sym(edges)
    nodes = sorted({n for e in sym for n in e})
    label = {n: n for n in nodes}
    for _ in range(iters):
        votes = {n: defaultdict(int) for n in nodes}
        for s, d in sym:
            votes[d][label[s]] += 1
        for n in nodes:
            votes[n][label[n]] += 1  # self-vote
        label = {
            n: min(votes[n], key=lambda lb: (-votes[n][lb], lb))
            for n in nodes
        }
    return label


def test_pagerank_fixed_point_exact(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["n"]: r["rank_fp"]
        for r in pagerank_fixed_point(df, iters=10).collect()
    }
    assert got == _ref_pagerank_fp(EDGES, iters=10)


def test_personalized_pagerank_fixed_point_exact(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (20,)], "n long")
    got = {
        r["n"]: r["rank_fp"]
        for r in personalized_pagerank_fixed_point(
            df, seeds, iters=10
        ).collect()
    }
    assert got == _ref_ppr_fp(EDGES, [0, 20], iters=10)


def test_label_propagation_exact(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["n"]: r["community"]
        for r in label_propagation(df, iters=4).collect()
    }
    assert got == _ref_lpa(EDGES, iters=4)
