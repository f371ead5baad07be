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
  against its ground truth: for each md5-banded candidate pair inside
  a bounded PER-BUCKET pair budget (rank ≤ ``_PAIR_CAP`` by (id_a,
  id_b) within each (band, bucket)), the signature-slot Jaccard
  estimate (matching mins / 8, exact ×1250 basis points) next to the
  EXACT 3-gram Jaccard, plus an exact census (n_pairs_total vs
  n_pairs_sampled) so capping is never silent. At 100 TB the near-dup
  pipeline trusts minhash agreement as a Jaccard proxy; this query
  measures that proxy's bias on a deterministic per-bucket sample —
  the expensive exact-Jaccard verify bill is bounded by
  buckets × budget instead of Σ C(k,2) (VERDICT r7 #1: the uncapped
  form was quadratic in template-family size, 4.3 → 38.4 s at
  10×→100×).
- ``pipeline_dedup_cascade`` — per-stage attrition of the standard
  dedup cascade: exact (normalized-content md5 keep-min-id, the
  ``d_exact_dup_groups`` convention) then near-dup (md5-LSH candidates
  over the exact-stage survivors; DROP ANY DOC WITH A QUALIFYING
  (exact-Jaccard ≥ 0.5) LOWER-ID CANDIDATE — note: not sequential
  greedy; a doc is dropped even when its qualifying partner is itself
  dropped, which under-counts survivors vs the keep-set cascade).
  Output is the 2-row docs_in/docs_out/removed table a corpus release
  report leads with. The near stage verifies pairs with an ITERATIVE
  min-rank sweep (geometric rank batches per doc, early-terminating on
  the first qualifying partner) — same answer as verify-all-pairs, so
  the quadratic DuckDB oracle still value-gates it, but the verify
  bill on boilerplate-heavy corpora is ~one pair per dropped doc
  instead of C(family, 2) (VERDICT r7 #1).

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

# Per-(band, bucket) pair budget for the calibration audit: the exact-
# Jaccard verify bill is bounded by |buckets| × _PAIR_CAP at ANY corpus
# size, while the skinny candidate generation (ids only) stays the
# proven-near-flat banded join. Deterministic: pairs rank by (id_a,
# id_b) inside their bucket, so both engines sample identically, and
# the census columns report exactly what the cap excluded.
_PAIR_CAP = 24


@register(
    "d_minhash_jaccard_calibration",
    f"""
    WITH sig AS (
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
    bands AS ({_BANDS_UNION}),
    pr AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROW_NUMBER() OVER (PARTITION BY a.band, a.bucket
                                  ORDER BY a.doc_id, b.doc_id) AS prk
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
    ),
    allp AS (SELECT DISTINCT id_a, id_b FROM pr),
    samp AS (SELECT DISTINCT id_a, id_b FROM pr WHERE prk <= {_PAIR_CAP}),
    census AS (
        SELECT CAST((SELECT COUNT(*) FROM allp) AS BIGINT) AS n_pairs_total,
               CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_pairs_sampled
    )
    SELECT s.id_a, s.id_b,
        CAST({_CAL_MATCH} AS BIGINT) AS match_slots,
        CAST(({_CAL_MATCH}) * 1250 AS BIGINT) AS est_bp,
        CAST(len(list_intersect(a.sh, b.sh)) * 10000 AS BIGINT)
            // CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                    AS BIGINT) AS jac_bp,
        c.n_pairs_total, c.n_pairs_sampled
    FROM samp s
    JOIN sig a ON a.doc_id = s.id_a
    JOIN sig b ON b.doc_id = s.id_b
    CROSS JOIN census c
    """,
    "MinHash estimator calibration under a bounded verify budget: for "
    f"each md5-banded candidate pair ranked <= {_PAIR_CAP} by (id_a, "
    "id_b) within its (band, bucket), the signature-slot Jaccard "
    "estimate (matching mins/8 as exact x1250 basis points) beside "
    "the EXACT 3-gram Jaccard (x10000 bp, trunc division) — the audit "
    "of the proxy the near-dup pipeline trusts at 100 TB. The census "
    "columns (n_pairs_total vs n_pairs_sampled) make the cap exact "
    "and visible — no silent truncation (VERDICT r7 #1: uncapped, the "
    "exact-Jaccard bill grew quadratically in template-family size, "
    "4.3 s at 10x -> 38.4 s at 100x; capped, it is bounded by "
    "buckets x budget). The banding self-join stays SKINNY (doc_id, "
    "band, bucket — arrays never ride the 4x fan-out), the rank "
    "window rides the bucket-partitioned pair stream, and only the "
    "sampled pairs join back to the persist()ed signature/shingle "
    "table.",
)
def d_minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_md5_slots, shingles
    from ..operators.relational import spread

    docs = spread(table(spark, sf_dir, "documents"), min_partitions=8)

    # signatures + shingle sets are the stored artifact a 100 TB dedup
    # pipeline materializes anyway; persist() so the banding pass and
    # both candidate join-backs read ONE computation (the arrays must
    # NOT ride the band explode — a first cut carried them through the
    # 4× fan-out and the exchange shuffled 4 copies of every shingle
    # set: 31.2 s at 10× vs ~6 s restructured). All 8 md5 slots come
    # from ONE Arrow kernel pass straight off the text column
    # (minhash_md5_slots, VERDICT r7 #3); __sh stays the JVM shingle
    # array the exact-Jaccard verify joins consume.
    mh8 = minhash_md5_slots(_N_HASHES)
    sig = (
        docs.select(
            "doc_id",
            shingles(F.col("text"), 3).alias("__sh"),
            mh8(F.col("text")).alias("__mh"),
        )
        .select(
            "doc_id",
            "__sh",
            *[F.col("__mh").getItem(i).alias(f"mh_{i}") for i in range(_N_HASHES)],
        )
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
    # skinny ranked pair stream: ids only through the join AND the rank
    # window; pr feeds both the census (distinct-all) and the sample
    # (rank-capped distinct), so persist() it — bucket-partitioned
    # row_number is deterministic because (id_a, id_b) is unique within
    # a bucket
    pr = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.band").alias("band"),
            F.col("l.bucket").alias("bucket"),
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
        )
        .withColumn(
            "prk",
            F.row_number().over(
                Window.partitionBy("band", "bucket").orderBy("id_a", "id_b")
            ),
        )
        .select("id_a", "id_b", "prk")
        .persist()
    )
    allp = pr.select("id_a", "id_b").distinct()
    samp = pr.filter(F.col("prk") <= _PAIR_CAP).select("id_a", "id_b").distinct()
    census = (
        allp.agg(F.count("*").cast("long").alias("n_pairs_total"))
        .crossJoin(
            F.broadcast(
                samp.agg(F.count("*").cast("long").alias("n_pairs_sampled"))
            )
        )
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
        samp.join(a, "id_a")
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
        .crossJoin(F.broadcast(census))
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
    "convention); stage 2 removes near-dups among the survivors: DROP "
    "ANY DOC WITH A QUALIFYING (exact 3-gram Jaccard >= 0.5) LOWER-ID "
    "md5-LSH CANDIDATE. (Not sequential greedy: a doc is dropped even "
    "when its qualifying partner was itself dropped, so docs_out "
    "under-counts survivors vs the keep-set cascade — deterministic "
    "and SQL-expressible either way.) Output is the 2-row "
    "docs_in/docs_out/removed table a corpus release leads with. The "
    "near stage verifies candidates with an ITERATIVE MIN-RANK SWEEP "
    "(VERDICT r7 #1): pairs stay skinny through the banded join, each "
    "doc's candidates are ranked by partner id, and geometric rank "
    "batches (1, then x16: 2-31, 32-511, ...) verify exact Jaccard "
    "ONLY for docs not already dropped by an earlier batch — "
    "identical answer to "
    "verify-all-pairs (the drop rule is EXISTS, and every rank of an "
    "undropped doc eventually gets tested), so the quadratic DuckDB "
    "oracle still value-gates it, but on boilerplate-heavy corpora "
    "the verify bill is ~one pair per dropped doc instead of "
    "C(family, 2) (uncapped: 9.1 s at 10x -> 70.9 s at 100x). "
    "log2(max candidates) bounded rounds, localCheckpoint lineage "
    "discipline (the operators/graph.py fixed-point pattern).",
)
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_md5_slots, shingles
    from ..operators.relational import spread

    docs = table(spark, sf_dir, "documents")
    norm = F.md5(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    )
    s1 = docs.groupBy(norm.alias("__h")).agg(F.min("doc_id").alias("doc_id"))
    d1 = docs.join(s1.select("doc_id"), "doc_id")

    # same skinny-banding discipline as the calibration query: the
    # shingle arrays never ride the band fan-out; candidates join back
    # to the persisted signature table (62.2 s → ~7 s at 10×); all 8
    # md5 slots from ONE Arrow kernel pass straight off the text
    # column (VERDICT r7 #3); __sh stays the JVM shingle array the
    # exact-Jaccard verify consumes
    mh8 = minhash_md5_slots(_N_HASHES)
    sig = (
        spread(d1, min_partitions=8)
        .select(
            "doc_id",
            shingles(F.col("text"), 3).alias("__sh"),
            mh8(F.col("text")).alias("__mh"),
        )
        .select(
            "doc_id",
            "__sh",
            *[F.col("__mh").getItem(i).alias(f"mh_{i}") for i in range(_N_HASHES)],
        )
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
    # skinny distinct candidate pairs, ranked per doc by partner id:
    # rank 1 is the doc's minimal candidate — on near-dup families the
    # first batch resolves almost every drop
    ranked = (
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
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("id_b").orderBy("id_a")),
        )
        .persist()
    )
    sh_a = sig.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = sig.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b"))
    qualify = F.expr(
        f"(size(array_intersect(sh_a, sh_b)) * 10000) div "
        f"(size(sh_a) + size(sh_b) "
        f"- size(array_intersect(sh_a, sh_b))) >= {_NEAR_BP}"
    )
    # geometric early-termination sweep: round 1 verifies ONLY each
    # doc's rank-1 (minimal) candidate — on near-dup corpora that
    # resolves the vast majority of drops with one pair per doc — then
    # ×16 rank batches ([2,32), [32,512), ...) for the docs still
    # undecided, anti-joined against the already-dropped set before
    # the expensive exact-Jaccard verify. EXISTS semantics make this
    # exact: a doc's fate never depends on other docs' fates, and
    # every rank of a never-qualifying doc is eventually tested. The
    # ×16 stride keeps the round count (each round ≈ a fixed-cost job
    # that re-probes the persisted signature table) at 3-4 for any
    # realistic max candidate-list length, while per-doc verify
    # overshoot stays ≤ 16× its first qualifying rank.
    max_rk_row = ranked.agg(F.max("rk").alias("m")).first()
    max_rk = max_rk_row["m"] or 0
    dropped: DataFrame | None = None
    lo = 1
    while lo <= max_rk:
        hi = 2 if lo == 1 else lo * 16
        batch = ranked.filter((F.col("rk") >= lo) & (F.col("rk") < hi))
        if dropped is not None:
            batch = batch.join(
                dropped.select(F.col("doc_id").alias("id_b")), "id_b", "left_anti"
            )
        newly = (
            batch.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .filter(qualify)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
            # cut the per-round lineage — the graph.py fixed-point
            # discipline (harnesses release the pinned blocks between
            # queries)
            .localCheckpoint(eager=True)
        )
        dropped = newly if dropped is None else dropped.union(newly)
        lo = hi
    if dropped is None:
        nd = spark.range(1).select(F.lit(0).cast("long").alias("nd"))
    else:
        nd = dropped.agg(F.count("*").cast("long").alias("nd"))
    n0 = docs.agg(F.count("*").alias("n0"))
    n1 = s1.agg(F.count("*").alias("n1"))
    row = n0.crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(nd))
    return row.selectExpr(
        "stack(2, 'exact', n0, n1, n0 - n1, "
        "'near_dup', n1, n1 - nd, nd) AS (stage, docs_in, docs_out, removed)"
    )
