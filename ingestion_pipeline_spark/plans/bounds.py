"""Bound-based oracles for the rows-only queries (VERDICT r6 #3).

Five registry entries have no DuckDB-expressible value oracle — their
output embeds engine-internal bytes (HLL sketches), engine-specific
hashes (xxhash64 signatures), or a codec DuckDB lacks (zlib).  Hash
gating stays off for them, but "runs and returns rows" is a weak gate:
this module gives each one a MATHEMATICAL bound the differential can
enforce, computed from the exact answer DuckDB (or stdlib Python)
produces on the same parquet:

- ``g_sketch_aggregates``: exact-count equality, HLL estimate within
  its analytic ±3·rsd band, approx-percentiles within the documented
  rank-error window of the exact sorted values.
- ``g_hll_partitioned_merge``: exact day counts; merged estimate
  within ±3·(1.04/√2^lgK) of the exact distinct count per group.
- ``tx_compression_ratio``: EXACT per-document equality against
  stdlib zlib at the same level (the oracle engine just isn't SQL).
- ``d_minhash_lsh_candidates``: key-domain validity (pairs ⊆ doc ids,
  id_a < id_b, no duplicates) plus guaranteed recall: identical-text
  pairs MUST be candidates (identical text → identical signature →
  every band collides).
- ``d_simhash_fingerprints``: doc_id set equality, well-formed 64-bit
  strings, and within-identical-text signature equality (simhash is a
  pure function of the tokenized text).

Each check returns a list of violation strings (empty = pass); the
checker prints ``PASS``/``FAIL`` accordingly, marked ``bounds`` so a
reader can tell a bound gate from a value-hash gate.
"""

from __future__ import annotations

import math
import zlib

__all__ = ["BOUND_CHECKS"]


def _rows_by(srows, key):
    return {r[key]: r for r in srows}


def check_sketch_aggregates(con, srows) -> list[str]:
    """approx_count_distinct(rsd=0.02) → |est−exact| ≤ 3·rsd·exact;
    percentile_approx(accuracy=10000) → value within the exact sorted
    array at rank p ± (1/accuracy + 1.5/n); n_events exact."""
    viol: list[str] = []
    exact = con.execute(
        "SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS du,"
        " list(value ORDER BY value) AS vals"
        " FROM events GROUP BY event_type"
    ).fetchall()
    exact_by = {r[0]: r for r in exact}
    got = _rows_by(srows, "event_type")
    if set(got) != set(exact_by):
        return [f"event_type domain {sorted(got)} != {sorted(exact_by)}"]
    rsd, eps = 0.02, 1.0 / 10_000
    for et, r in got.items():
        _, n, du, vals = exact_by[et]
        if r["n_events"] != n:
            viol.append(f"{et}: n_events {r['n_events']} != exact {n}")
        band = 3 * rsd * du + 2  # +2 absolute slack for tiny groups
        if abs(r["approx_users"] - du) > band:
            viol.append(
                f"{et}: approx_users {r['approx_users']} outside "
                f"{du}±{band:.1f} (3·rsd)"
            )
        for p, q in zip((0.5, 0.95, 0.99), r["value_quantiles"]):
            slack = eps + 1.5 / n
            lo = vals[max(0, math.floor((p - slack) * n) - 1)]
            hi = vals[min(n - 1, math.ceil((p + slack) * n))]
            if not (lo <= q <= hi):
                viol.append(
                    f"{et}: p{int(p*100)} approx {q} outside exact rank "
                    f"window [{lo}, {hi}]"
                )
    return viol


def check_hll_partitioned_merge(con, srows) -> list[str]:
    """Merged daily HLL estimate within ±3·(1.04/√2^12) ≈ 4.9% of the
    exact period distinct count; per-type day counts exact."""
    viol: list[str] = []
    exact = con.execute(
        "SELECT event_type, COUNT(DISTINCT CAST(ts AS DATE)) AS days,"
        " COUNT(DISTINCT user_id) AS du FROM events GROUP BY event_type"
    ).fetchall()
    exact_by = {r[0]: r for r in exact}
    got = _rows_by(srows, "event_type")
    if set(got) != set(exact_by):
        return [f"event_type domain {sorted(got)} != {sorted(exact_by)}"]
    rel = 3 * 1.04 / math.sqrt(2 ** 12)  # lgK=12 default → ~4.9%
    for et, r in got.items():
        _, days, du = exact_by[et]
        if r["n_days"] != days:
            viol.append(f"{et}: n_days {r['n_days']} != exact {days}")
        band = rel * du + 2
        if abs(r["est_users"] - du) > band:
            viol.append(
                f"{et}: est_users {r['est_users']} outside {du}±{band:.1f}"
            )
    return viol


def check_compression_ratio(con, srows) -> list[str]:
    """Exact per-document parity with stdlib zlib level 6 (same codec
    the pandas UDF calls); flag column must equal the threshold test."""
    viol: list[str] = []
    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    if set(r["doc_id"] for r in srows) != set(texts):
        return ["doc_id set mismatch vs documents"]
    for r in srows:
        t = texts[r["doc_id"]]
        if not t:
            want = None
        else:
            raw = t.encode("utf-8")
            want = len(zlib.compress(raw, 6)) / len(raw)
        got = r["zlib_ratio"]
        if (want is None) != (got is None) or (
            want is not None and f"{got:.10g}" != f"{want:.10g}"
        ):
            viol.append(f"doc {r['doc_id']}: ratio {got} != zlib {want}")
            if len(viol) >= 3:
                break
        want_flag = None if want is None else (want < 0.35 or want > 0.9)
        if want is None:
            # None-parity both ways: an empty/NULL-text doc must carry a
            # NULL flag too (a spurious non-NULL flag used to pass).
            if r["flag_compressibility"] is not None:
                viol.append(
                    f"doc {r['doc_id']}: flag "
                    f"{r['flag_compressibility']} on NULL-ratio doc"
                )
        elif r["flag_compressibility"] != want_flag:
            viol.append(f"doc {r['doc_id']}: flag != threshold test")
    return viol


def check_minhash_candidates(con, srows) -> list[str]:
    """Domain validity + guaranteed recall on identical-text pairs
    (identical text → identical signature → all 16 bands collide)."""
    viol: list[str] = []
    ids = {r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()}
    pairs = set()
    for r in srows:
        a, b = r["id_a"], r["id_b"]
        if not (a in ids and b in ids):
            viol.append(f"pair ({a},{b}) outside doc_id domain")
        if not a < b:
            viol.append(f"pair ({a},{b}) violates id_a < id_b")
        if (a, b) in pairs:
            viol.append(f"duplicate pair ({a},{b})")
        pairs.add((a, b))
        if len(viol) >= 3:
            return viol
    must = con.execute(
        "SELECT a.doc_id, b.doc_id FROM documents a JOIN documents b"
        " ON a.text = b.text AND a.doc_id < b.doc_id"
    ).fetchall()
    missing = [p for p in must if tuple(p) not in pairs]
    if missing:
        viol.append(
            f"{len(missing)} identical-text pairs NOT candidates "
            f"(recall bound), e.g. {missing[:3]}"
        )
    return viol


def check_simhash_fingerprints(con, srows) -> list[str]:
    """doc_id set equality, 64-bit-string well-formedness, and equal
    signatures within identical-text groups (simhash is deterministic
    in the text)."""
    viol: list[str] = []
    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    got = {r["doc_id"]: r["simhash"] for r in srows}
    if set(got) != set(texts) or len(srows) != len(texts):
        return ["doc_id set mismatch vs documents"]
    by_text: dict[str, set[str]] = {}
    for did, sh in got.items():
        if len(sh) != 64 or set(sh) - {"0", "1"}:
            viol.append(f"doc {did}: malformed simhash {sh[:16]}…")
            if len(viol) >= 3:
                return viol
        by_text.setdefault(texts[did], set()).add(sh)
    clashes = [t[:40] for t, shs in by_text.items() if len(shs) > 1]
    if clashes:
        viol.append(
            f"{len(clashes)} identical-text groups with differing "
            f"simhashes, e.g. {clashes[:2]}"
        )
    return viol


BOUND_CHECKS = {
    "g_sketch_aggregates": check_sketch_aggregates,
    "g_hll_partitioned_merge": check_hll_partitioned_merge,
    "tx_compression_ratio": check_compression_ratio,
    "d_minhash_lsh_candidates": check_minhash_candidates,
    "d_simhash_fingerprints": check_simhash_fingerprints,
}
