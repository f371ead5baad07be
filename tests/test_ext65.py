"""Pure-Python recompute / law tests for the ext65 tranche (round 7):
join-skew profile, minhash-Jaccard calibration, dedup-cascade
attrition — the same independent-recompute discipline as test_ext62-64.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import duckdb
import pytest

from ingestion_pipeline_spark.plans import query_map

_WORD = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    return [t for t in _WORD.split((text or "").lower()) if t]


def _shingles(text: str) -> set[str]:
    toks = _tokens(text)
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _minhash8(sh: set[str]) -> list[str] | None:
    if not sh:
        return None
    return [
        min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
        for i in range(8)
    ]


@pytest.fixture(scope="module")
def docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def test_join_skew_profile_recompute(spark, sf_dir):
    con = duckdb.connect()
    keys = [
        r[0]
        for r in con.execute(
            f"SELECT o_custkey FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchall()
    ]
    cnts = Counter(keys)
    total, n_keys, max_cnt = len(keys), len(cnts), max(cnts.values())
    # percentiles by rank over sorted counts (the histogram-cum rule)
    asc = sorted(cnts.values())

    def pct(p: int) -> int:
        return asc[max(1, (n_keys * p) // 100) - 1]

    top10 = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = query_map()["dq_join_skew_profile"](spark, sf_dir).collect()
    assert len(rows) == 10
    by_rank = sorted(rows, key=lambda r: r["rank"])
    for want, got in zip(top10, by_rank):
        assert (got["o_custkey"], got["cnt"]) == want
        assert got["share_bp"] == got["cnt"] * 10000 // total
        assert got["n_keys"] == n_keys
        assert got["p50_cnt"] == pct(50)
        assert got["p99_cnt"] == pct(99)
        assert got["skew_x100"] == max_cnt * 100 * n_keys // total


def test_minhash_calibration_recompute(spark, sf_dir, docs):
    sigs = {d: _minhash8(_shingles(t)) for d, t in docs}
    shs = {d: _shingles(t) for d, t in docs}
    # independent recompute of the hot-bucket doc cap (each bucket
    # contributes pairs among its _BUCKET_CAP lowest doc_ids) and the
    # exact census columns the capped plan must report
    from ingestion_pipeline_spark.plans.registry_ext65 import _BUCKET_CAP

    ids = [d for d, _ in docs if sigs[d] is not None]
    buckets: dict[tuple[int, str], list[int]] = {}
    for d in ids:
        sa = sigs[d]
        for band in range(4):
            buckets.setdefault(
                (band, sa[2 * band] + sa[2 * band + 1]), []
            ).append(d)
    n_bucket_slots = 0
    n_hot = 0
    samp_pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        k = len(members)
        n_bucket_slots += k * (k - 1) // 2
        if k > _BUCKET_CAP:
            n_hot += 1
        kept = sorted(members)[:_BUCKET_CAP]
        samp_pairs.update(
            (a, b) for i, a in enumerate(kept) for b in kept[i + 1 :]
        )
    rows = query_map()["d_minhash_jaccard_calibration"](spark, sf_dir).collect()
    assert rows, "fixture should produce at least one candidate pair"
    seen = set()
    for r in rows:
        a, b = r["id_a"], r["id_b"]
        assert a < b and (a, b) not in seen
        seen.add((a, b))
        sa, sb = sigs[a], sigs[b]
        assert sa is not None and sb is not None
        slots = sum(x == y for x, y in zip(sa, sb))
        assert r["match_slots"] == slots
        assert r["est_bp"] == slots * 1250
        inter = len(shs[a] & shs[b])
        union = len(shs[a] | shs[b])
        assert r["jac_bp"] == inter * 10000 // union
        # LSH membership: at least one of the 4 (2-row) bands collides
        assert any(
            sa[2 * band] == sb[2 * band] and sa[2 * band + 1] == sb[2 * band + 1]
            for band in range(4)
        )
        # census columns are exact and constant across rows
        assert r["n_bucket_slots"] == n_bucket_slots
        assert r["n_hot_buckets"] == n_hot
        assert r["n_pairs_sampled"] == len(samp_pairs)
    # the reported pair set is EXACTLY the deterministic per-bucket
    # doc-capped sample; nothing outside it, nothing sampled missing
    assert seen == samp_pairs
    assert len(samp_pairs) <= n_bucket_slots


def test_dedup_cascade_recompute(spark, sf_dir, docs):
    rows = {
        r["stage"]: r
        for r in query_map()["pipeline_dedup_cascade"](spark, sf_dir).collect()
    }
    assert set(rows) == {"exact", "near_dup"}
    n0 = len(docs)
    # stage 1: keep min doc_id per normalized-content hash
    norm = lambda t: re.sub(r"\s+", " ", (t or "").strip().lower())  # noqa: E731
    keep: dict[str, int] = {}
    for d, t in docs:
        h = hashlib.md5(norm(t).encode()).hexdigest()
        keep[h] = min(keep.get(h, d), d)
    survivors = set(keep.values())
    ex = rows["exact"]
    assert (ex["docs_in"], ex["docs_out"]) == (n0, len(survivors))
    assert ex["removed"] == n0 - len(survivors)
    assert ex["over_budget_docs"] == 0
    # stage 2: md5-LSH candidates among survivors ranked per doc by
    # shared-band count (desc, id_a tie-break); verify only the top
    # _VERIFY_K; drop the higher id on exact J >= 0.5
    from ingestion_pipeline_spark.plans.registry_ext65 import _VERIFY_K

    shs = {d: _shingles(t) for d, t in docs if d in survivors}
    sigs = {d: _minhash8(shs[d]) for d in shs}
    ids = sorted(d for d in sigs if sigs[d] is not None)
    cands: dict[int, list[tuple[int, int]]] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sigs[a], sigs[b]
            nb = sum(
                sa[2 * k] == sb[2 * k] and sa[2 * k + 1] == sb[2 * k + 1]
                for k in range(4)
            )
            if nb:
                cands.setdefault(b, []).append((-nb, a))
    drops = set()
    over_budget = 0
    for b, lst in cands.items():
        lst.sort()
        if len(lst) > _VERIFY_K:
            over_budget += 1
        for _negnb, a in lst[:_VERIFY_K]:
            inter = len(shs[a] & shs[b])
            union = len(shs[a] | shs[b])
            if inter * 10000 // union >= 5000:
                drops.add(b)
                break
    nd = rows["near_dup"]
    assert (nd["docs_in"], nd["removed"]) == (len(survivors), len(drops))
    assert nd["docs_out"] == len(survivors) - len(drops)
    assert nd["over_budget_docs"] == over_budget
    # accounting chain
    assert ex["docs_out"] == nd["docs_in"]
