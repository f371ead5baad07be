#!/usr/bin/env python3
"""Rounding-boundary margin audit for the log2-dependent value hashes.

The repo's determinism discipline makes every hashed float either (a) a
single IEEE op over exact integers (bit-identical across engines) or
(b) a ROUND(transcendental, 6).  Class (b) — ``log2`` in
``tx_bigram_perplexity``, ``g_cooccurrence_pmi``,
``tx_unigram_surprisal`` — carries a residual risk: Spark's Math.log
and DuckDB's libm log2 may differ in the last ulp, and if the true
value sits ON a 0.5e-6 rounding boundary the two engines can round to
different grids and flip the value hash.

This tool measures that risk for a concrete dataset: it recomputes the
UNROUNDED doubles in DuckDB (formulas kept in sync with the registry —
tokenizer SQL is imported from the tranche modules) and reports, per
query, the minimum distance of value*1e6 to the nearest half-integer
boundary.  A 1-ulp divergence on a surprisal-scale value moves value*1e6
by ~1e-8; sums of a few hundred terms by ~1e-6.  We therefore require a
margin > 1e-4 (100x the worst plausible divergence) for a PASS.

Usage: python tools/check_round_margins.py [sf_dir]   (default sf0.01,
the driver's grading scale).
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, ".")

from ingestion_pipeline_spark.plans.registry_ext56 import _TOKS  # noqa: E402

MARGIN_REQUIRED = 1e-4

# Unrounded twins of the registered oracles' final float expressions.
# Sources: registry_ext56.tx_bigram_perplexity, registry_ext59
# .g_cooccurrence_pmi, registry_ext17 (unigram surprisal family).
CHECKS: dict[str, str] = {
    "tx_bigram_perplexity.mean_surprisal": f"""
    WITH tokd AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    bigr AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM tokd, UNNEST(range(1, len(tk))) AS u(i)
    ),
    uni AS (
        SELECT w, COUNT(*) AS cu FROM (
            SELECT unnest(tk) AS w FROM tokd
        ) GROUP BY w
    ),
    vocab AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bfreq AS (SELECT w1, w2, COUNT(*) AS cb FROM bigr GROUP BY w1, w2),
    per AS (
        SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bigr GROUP BY doc_id, w1, w2
    ),
    terms AS (
        SELECT p.doc_id, p.tf,
               CAST(p.tf AS DOUBLE)
               * (-log2((b.cb + 1) / (u.cu + vocab.v))) AS term
        FROM per p
        JOIN bfreq b ON p.w1 = b.w1 AND p.w2 = b.w2
        JOIN uni u ON p.w1 = u.w
        CROSS JOIN vocab
    )
    SELECT list_aggregate(list_sort(list(term)), 'sum')
           / CAST(SUM(tf) AS DOUBLE) AS raw
    FROM terms GROUP BY doc_id
    """,
    # registry_ext62.d_dsir_importance — same class: sorted fold of
    # per-bucket log2 likelihood ratios, rounded to 6dp and hashed
    "d_dsir_importance.dsir_score": f"""
    WITH tokd AS (SELECT doc_id, lang, {_TOKS} AS tk FROM documents),
    bigr AS (
        SELECT doc_id, lang, tk[i] AS w1, tk[i + 1] AS w2
        FROM tokd, UNNEST(range(1, len(tk))) AS u(i)
    ),
    feats AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('dsir' || w1 || ' ' || w2), 1, 8))
                    AS BIGINT) % 256 AS b
        FROM bigr
    ),
    raw_c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM feats GROUP BY b),
    tgt_c AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM feats
        WHERE lang = 'en' GROUP BY b
    ),
    tot AS (
        SELECT (SELECT CAST(SUM(cr) AS DOUBLE) FROM raw_c) AS r,
               (SELECT CAST(COALESCE(SUM(ct), 0) AS DOUBLE) FROM tgt_c) AS t
    ),
    lr AS (
        SELECT r.b,
               log2(((COALESCE(t.ct, 0) + 1) / (tot.t + 256))
                    / ((r.cr + 1) / (tot.r + 256))) AS lr
        FROM raw_c r LEFT JOIN tgt_c t ON r.b = t.b CROSS JOIN tot
    ),
    per AS (
        SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS tf
        FROM feats GROUP BY doc_id, b
    )
    SELECT list_aggregate(list_sort(list(CAST(p.tf AS DOUBLE) * l.lr)),
                          'sum') AS raw
    FROM per p JOIN lr l ON p.b = l.b
    GROUP BY p.doc_id
    """,
    "g_cooccurrence_pmi.pmi": f"""
    WITH tokd AS (SELECT {_TOKS} AS tk FROM documents),
    bigr AS (
        SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM tokd, UNNEST(range(1, len(tk))) AS u(i)
    ),
    uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
        FROM (SELECT unnest(tk) AS w FROM tokd) GROUP BY w
    ),
    bf AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
        FROM bigr GROUP BY w1, w2
    ),
    tot AS (
        SELECT (SELECT CAST(SUM(cu) AS DOUBLE) FROM uni) AS nu,
               (SELECT CAST(SUM(cb) AS DOUBLE) FROM bf) AS nb
    )
    SELECT log2((CAST(b.cb AS DOUBLE) / t.nb)
                / ((CAST(u1.cu AS DOUBLE) / t.nu)
                   * (CAST(u2.cu AS DOUBLE) / t.nu))) AS raw
    FROM bf b
    JOIN uni u1 ON b.w1 = u1.w
    JOIN uni u2 ON b.w2 = u2.w
    CROSS JOIN tot t
    WHERE b.cb >= 5
    """,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    report = {}
    failed = False
    for name, sql in CHECKS.items():
        vals = [r[0] for r in con.execute(sql).fetchall() if r[0] is not None]
        min_dist, at = math.inf, None
        for x in vals:
            y = x * 1e6
            dist = abs(y - math.floor(y) - 0.5)
            if dist < min_dist:
                min_dist, at = dist, x
        ok = min_dist > MARGIN_REQUIRED
        failed |= not ok
        report[name] = {
            "n_values": len(vals),
            "min_boundary_dist_x1e6": min_dist,
            "closest_value": at,
            "pass": ok,
        }
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: {len(vals)} values, "
            f"min |value*1e6 - nearest .5 boundary| = {min_dist:.6g} "
            f"(need > {MARGIN_REQUIRED:g}; closest raw value {at!r})"
        )
    print(json.dumps({"sf_dir": sf_dir, "checks": report}, default=float))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
