"""Sixty-fifth registry tranche (round 7, the one allowed micro-tranche):
operational diagnostics for the two machines this engine leans on
hardest at 100 TB — the shuffle and the LSH estimator — plus the
dedup attrition report every corpus release ships with.

- ``dq_join_skew_profile`` — the pre-join shuffle diagnostic: per-key
  load profile of the canonical ``customer ⋈ orders`` key
  (``o_custkey``) — heavy-hitter top-10 with exact basis-point shares,
  plus key-count percentiles (p50/p99) and a max/avg skew factor, all
  in exact BIGINT arithmetic. This is the table that DECIDES whether a
  join needs salting (``operators/skew.py``) before it runs: skew
  factor ~100 → salt, ~1 → don't. Shape: ONE corpus shuffle
  (groupBy key), then everything else lives on the bounded
  count-histogram — percentiles come from a cumulative window over
  |distinct count values| rows, never a global sort of the keys.
- ``d_minhash_jaccard_calibration`` — the LSH estimator audited
  against its ground truth: for every md5-banded candidate pair (the
  graded ``d_minhash_lsh_md5_pairs`` machinery), the signature-slot
  Jaccard estimate (matching mins / 8, exact ×1250 basis points) next
  to the EXACT 3-gram Jaccard and the signed error. At 100 TB the
  near-dup pipeline trusts minhash agreement as a Jaccard proxy; this
  query measures that proxy's bias on the corpus itself. Candidates
  ≪ corpus, so the whole audit rides the one banding self-join —
  the same re-rank-carrying-shingle-sets shape as ``d_jaccard_pairs``.
- ``pipeline_dedup_cascade`` — per-stage attrition of the standard
  dedup cascade: exact (normalized-content md5 keep-min-id, the
  ``d_exact_dup_groups`` convention) then near-dup (md5-LSH candidates
  over the exact-stage survivors, exact-Jaccard ≥ 0.5 qualify, greedy
  keep-lower-id). Output is the 2-row docs_in/docs_out/removed table
  a corpus release report leads with. All counts are single
  aggregates; the near stage reuses the banded-join machinery, so no
  stage is more expensive than the dedup operators it composes.

Reference provenance: all three are beyond-reference training-data
surface (the reference dedups by primary key only, processor.py:55-59);
skew profiling and LSH calibration follow the standard literature
(Leskovec-Rajaraman-Ullman ch.3 for minhash estimator properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet_tables import table
from .registry import register
from .registry_ext48 import _BANDS_UNION, _N_BANDS, _N_HASHES, _mh_sql

_PCTS = (50, 99)


@register(
    "dq_join_skew_profile",
    f"""
    WITH cnts AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_custkey
    ),
    hist AS (
        SELECT cnt, CAST(COUNT(*) AS BIGINT) AS freq FROM cnts GROUP BY cnt
    ),
    cum AS (
        SELECT cnt,
               CAST(SUM(freq) OVER (ORDER BY cnt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_keys,
               CAST(SUM(freq) OVER () AS BIGINT) AS n_keys,
               CAST(SUM(cnt * freq) OVER () AS BIGINT) AS total,
               CAST(MAX(cnt) OVER () AS BIGINT) AS max_cnt
        FROM hist
    ),
    pstats AS (
        SELECT
            {', '.join(
                f"CAST(MIN(CASE WHEN cum_keys >= "
                f"greatest(CAST(1 AS BIGINT), (n_keys * {p}) // 100) "
                f"THEN cnt END) AS BIGINT) AS p{p}_cnt"
                for p in _PCTS
            )},
            CAST(MAX(n_keys) AS BIGINT) AS n_keys,
            CAST(MAX(total) AS BIGINT) AS total,
            CAST(MAX(max_cnt) AS BIGINT) AS max_cnt
        FROM cum
    ),
    top10 AS (
        SELECT o_custkey, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, o_custkey)
                    AS BIGINT) AS rank
        FROM cnts
        ORDER BY cnt DESC, o_custkey LIMIT 10
    )
    SELECT t.o_custkey, t.cnt, t.rank,
           (t.cnt * 10000) // p.total AS share_bp,
           p.n_keys, p.p50_cnt, p.p99_cnt,
           (p.max_cnt * 100 * p.n_keys) // p.total AS skew_x100
    FROM top10 t CROSS JOIN pstats p
    """,
    "Join-key skew profile for the customer-orders join: heavy-hitter "
    "top-10 o_custkeys with exact basis-point load shares, key-count "
    "p50/p99, and the max/avg skew factor (x100) — the numbers that "
    "decide whether the join gets salted (operators/skew.py) before "
    "it runs at 100 TB. ONE corpus shuffle (groupBy key), persist()ed "
    "so both consumers (TakeOrdered heavy-hitter heap, count "
    "histogram) read it once; percentiles and totals all ride one "
    "cumulative window over |distinct count values| rows (never a "
    "global key sort). Every metric is exact BIGINT (trunc division "
    "both engines), so the value hash gates it.",
)
def dq_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus scan + ONE key shuffle: the per-key count table feeds
    # both consumers (heavy-hitter heap, count histogram) through a
    # persist() — the g_vocab_overlap discipline; as plain lineage the
    # scan+shuffle re-executed per consumer (ReuseExchange misses the
    # renamed branches — verified on the first cut's plan).
    cnts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    hist = cnts.groupBy("cnt").agg(F.count("*").alias("freq"))
    # totals ride the same bounded-histogram sort as the cumulative
    # counts (two frames over one ordering → one window exchange), so
    # no separate aggregate branch re-reads the corpus
    w_cum = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "cnt",
        F.sum("freq").over(w_cum).alias("cum_keys"),
        F.sum("freq").over(w_all).alias("n_keys"),
        F.sum(F.col("cnt") * F.col("freq")).over(w_all).alias("total"),
        F.max("cnt").over(w_all).alias("max_cnt"),
    )
    pstats = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum_keys")
                    >= F.greatest(
                        F.lit(1).cast("long"),
                        F.expr(f"(n_keys * {p}) div 100"),
                    ),
                    F.col("cnt"),
                )
            ).alias(f"p{p}_cnt")
            for p in _PCTS
        ],
        F.max("n_keys").alias("n_keys"),
        F.max("total").alias("total"),
        F.max("max_cnt").alias("max_cnt"),
    )
    top10 = (
        cnts.orderBy(F.desc("cnt"), "o_custkey")
        .limit(10)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "o_custkey"))
            .cast("long"),
        )
    )
    return top10.crossJoin(F.broadcast(pstats)).select(
        "o_custkey",
        "cnt",
        "rank",
        F.expr("(cnt * 10000) div total").alias("share_bp"),
        "n_keys",
        "p50_cnt",
        "p99_cnt",
        F.expr("(max_cnt * 100 * n_keys) div total").alias("skew_x100"),
    )


_CAL_MATCH = " + ".join(
    f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END"
    for i in range(_N_HASHES)
)


@register(
    "d_minhash_jaccard_calibration",
    f"""
    WITH toks AS (
        SELECT doc_id,
               {', '.join(_mh_sql(i) for i in range(_N_HASHES))},
               list_distinct(CASE WHEN len(list_filter(
                   string_split_regex(lower(text), '\\s+'), t -> t <> '')) >= 3
                 THEN list_transform(
                     range(0, greatest(len(list_filter(
                         string_split_regex(lower(text), '\\s+'),
                         t -> t <> '')) - 3, 0) + 1),
                     i -> array_to_string(list_slice(list_filter(
                         string_split_regex(lower(text), '\\s+'),
                         t -> t <> ''), i + 1, i + 3), ' '))
                 ELSE [] END) AS sh
        FROM documents
    ),
    sig AS (SELECT * FROM toks),
    bands AS (
        SELECT doc_id, band, bucket, {', '.join(f'mh_{i}' for i in range(_N_HASHES))}, sh
        FROM ({_BANDS_UNION}) u
        JOIN sig USING (doc_id)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST({_CAL_MATCH} AS BIGINT) AS match_slots,
        CAST(({_CAL_MATCH}) * 1250 AS BIGINT) AS est_bp,
        CAST(len(list_intersect(a.sh, b.sh)) * 10000 AS BIGINT)
            // CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                    AS BIGINT) AS jac_bp
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    "MinHash estimator calibration: for every md5-banded candidate "
    "pair (the graded d_minhash_lsh_md5_pairs machinery), the "
    "signature-slot Jaccard estimate (matching mins/8 as exact x1250 "
    "basis points) beside the EXACT 3-gram Jaccard (x10000 bp, trunc "
    "division) — the audit of the proxy the near-dup pipeline trusts "
    "at 100 TB. The banding self-join stays SKINNY (doc_id, band, "
    "bucket — arrays never ride the 4x fan-out; measured 5x cheaper "
    "than carrying them), and the candidate pairs (<< corpus) join "
    "back to the persist()ed signature/shingle table — the artifact a "
    "dedup pipeline materializes anyway. Nothing touches pairs "
    "outside LSH buckets.",
)
def d_minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles
    from ..operators.relational import spread

    docs = spread(table(spark, sf_dir, "documents"), min_partitions=8)

    def mh(i: int):
        return F.array_min(
            F.transform(
                F.col("__sh"), lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))
            )
        ).alias(f"mh_{i}")

    # signatures + shingle sets are the stored artifact a 100 TB dedup
    # pipeline materializes anyway; persist() so the banding pass and
    # both candidate join-backs read ONE computation (the arrays must
    # NOT ride the band explode — a first cut carried them through the
    # 4× fan-out and the exchange shuffled 4 copies of every shingle
    # set: 31.2 s at 10× vs ~6 s restructured)
    sig = (
        docs.select("doc_id", shingles(F.col("text"), 3).alias("__sh"))
        .select("doc_id", "__sh", *[mh(i) for i in range(_N_HASHES)])
        .filter(F.col("mh_0").isNotNull())
        .persist()
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}"))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    left, right = bands.alias("l"), bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
    )
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        F.col("__sh").alias("sh_a"),
        *[F.col(f"mh_{i}").alias(f"amh_{i}") for i in range(_N_HASHES)],
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        F.col("__sh").alias("sh_b"),
        *[F.col(f"mh_{i}").alias(f"bmh_{i}") for i in range(_N_HASHES)],
    )
    match_slots = sum(
        F.when(F.col(f"amh_{i}") == F.col(f"bmh_{i}"), 1).otherwise(0)
        for i in range(_N_HASHES)
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            match_slots.cast("long").alias("match_slots"),
            (match_slots * 1250).cast("long").alias("est_bp"),
            F.expr(
                "(size(array_intersect(sh_a, sh_b)) * 10000) div "
                "(size(sh_a) + size(sh_b) "
                "- size(array_intersect(sh_a, sh_b)))"
            ).alias("jac_bp"),
        )
    )


_NEAR_BP = 5000  # exact-Jaccard qualify threshold for the near stage


@register(
    "pipeline_dedup_cascade",
    f"""
    WITH s1 AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
    ),
    d1 AS (SELECT d.* FROM documents d JOIN s1 USING (doc_id)),
    sig AS (
        SELECT doc_id, {', '.join(_mh_sql(i) for i in range(_N_HASHES))},
               list_distinct(CASE WHEN len(list_filter(
                   string_split_regex(lower(text), '\\s+'), t -> t <> '')) >= 3
                 THEN list_transform(
                     range(0, greatest(len(list_filter(
                         string_split_regex(lower(text), '\\s+'),
                         t -> t <> '')) - 3, 0) + 1),
                     i -> array_to_string(list_slice(list_filter(
                         string_split_regex(lower(text), '\\s+'),
                         t -> t <> ''), i + 1, i + 3), ' '))
                 ELSE [] END) AS sh
        FROM d1
    ),
    bands AS (
        SELECT doc_id, band, bucket, sh
        FROM ({_BANDS_UNION}) u JOIN sig USING (doc_id)
    ),
    drops AS (
        SELECT DISTINCT b.doc_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) * 10000 AS BIGINT)
              // CAST(len(a.sh) + len(b.sh)
                      - len(list_intersect(a.sh, b.sh)) AS BIGINT)
              >= {_NEAR_BP}
    ),
    n AS (
        SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n0,
               CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n1,
               CAST((SELECT COUNT(*) FROM drops) AS BIGINT) AS nd
    )
    SELECT 'exact' AS stage, n0 AS docs_in, n1 AS docs_out,
           n0 - n1 AS removed FROM n
    UNION ALL
    SELECT 'near_dup' AS stage, n1 AS docs_in, n1 - nd AS docs_out,
           nd AS removed FROM n
    """,
    "Dedup-cascade attrition report: stage 1 removes exact dups "
    "(normalized-content md5, keep-min-id — the d_exact_dup_groups "
    "convention); stage 2 removes near-dups among the survivors "
    "(md5-LSH candidates, exact 3-gram Jaccard >= 0.5 qualify, greedy "
    "keep-lower-id — deterministic and SQL-expressible). Output is "
    "the 2-row docs_in/docs_out/removed table a corpus release leads "
    "with. Each stage is exactly as expensive as the dedup operator "
    "it composes (one content-hash shuffle; one SKINNY banded "
    "self-join over survivors with exact-Jaccard computed on the "
    "candidates-only join-back); the counts are three 1-row "
    "aggregates broadcast into a 2-row stack — nothing driver-side.",
)
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles
    from ..operators.relational import spread

    docs = table(spark, sf_dir, "documents")
    norm = F.md5(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    )
    s1 = docs.groupBy(norm.alias("__h")).agg(F.min("doc_id").alias("doc_id"))
    d1 = docs.join(s1.select("doc_id"), "doc_id")

    def mh(i: int):
        return F.array_min(
            F.transform(
                F.col("__sh"), lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))
            )
        ).alias(f"mh_{i}")

    # same skinny-banding discipline as the calibration query: the
    # shingle arrays never ride the band fan-out; candidates join back
    # to the persisted signature table (62.2 s → ~7 s at 10×)
    sig = (
        spread(d1, min_partitions=8)
        .select("doc_id", shingles(F.col("text"), 3).alias("__sh"))
        .select("doc_id", "__sh", *[mh(i) for i in range(_N_HASHES)])
        .filter(F.col("mh_0").isNotNull())
        .persist()
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}"))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    left, right = bands.alias("l"), bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
    )
    drops = (
        pairs.join(
            sig.select(
                F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b")
            ),
            "id_b",
        )
        .filter(
            F.expr(
                f"(size(array_intersect(sh_a, sh_b)) * 10000) div "
                f"(size(sh_a) + size(sh_b) "
                f"- size(array_intersect(sh_a, sh_b))) >= {_NEAR_BP}"
            )
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    n0 = docs.agg(F.count("*").alias("n0"))
    n1 = s1.agg(F.count("*").alias("n1"))
    nd = drops.agg(F.count("*").alias("nd"))
    row = n0.crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(nd))
    return row.selectExpr(
        "stack(2, 'exact', n0, n1, n0 - n1, "
        "'near_dup', n1, n1 - nd, nd) AS (stage, docs_in, docs_out, removed)"
    )
