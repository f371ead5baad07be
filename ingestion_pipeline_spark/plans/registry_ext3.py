"""Fourth registry tranche: wider TPC-H shapes (Q7 multi-dim trade
flow, Q15 argmax-on-aggregate, Q19 OR-of-conjuncts pushdown), the P3
template / P9 rewrite scalar ops as oracle queries, and a portable-md5
MinHash signature check that upgrades the dedup core from rows-only to
value-verified. Same contract as ``registry``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents_disc_price, money, one_minus, sum_cents
from ..functions.extract import enhance_query
from ..operators.relational import spread
from ..sources.parquet_tables import table
from .registry import SQL_DISC, SQL_EXT, _disc_price, register


@register(
    "q7_nation_trade",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               {SQL_EXT} * {SQL_DISC} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 shape: 5-way join with a symmetric two-nation predicate "
    "and per-year rollup. nation (25 rows) broadcasts twice; supplier "
    "broadcasts; only orders×lineitem is a fact-fact sort-merge — one "
    "shuffle pair at any scale.",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            sum_cents(cents_disc_price(), "revenue", 4),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({SQL_EXT} * {SQL_DISC}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15 shape: argmax over an aggregate (top supplier by "
    "quarterly revenue). The max is a 1-row broadcast cross-join — "
    "NEVER a global-window sort (a single-partition window would "
    "serialize the whole table through one task). Decimal-exact "
    "revenue makes the equality deterministic on both engines.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue_dec")
    )
    top = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue_dec") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q19_flexible_or",
    f"""
    SELECT CAST(SUM({SQL_EXT} * {SQL_DISC}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 shape: OR-of-conjuncts over a broadcast dim join. "
    "Catalyst extracts the common l_quantity bounds (1..30) as a "
    "pushable scan predicate; the full OR evaluates post-join.",
)
def q19_flexible_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    def clause(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            clause("Brand#1", 15, 1, 11)
            | clause("Brand#2", 25, 10, 20)
            | clause("Brand#3", 35, 20, 30)
        )
        .agg(
            sum_cents(cents_disc_price(), "revenue", 4),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "p_embed_text_template",
    """
    SELECT doc_id,
           chr(10) || '            Title: ' || source ||
           chr(10) || '            CVE ID: CVE-2024-' || CAST(doc_id AS VARCHAR) ||
           chr(10) || '            Description: ' || substring(text, 1, 100) ||
           chr(10) || '            ' AS embed_text
    FROM documents
    """,
    "P3 — the reference's embedding-text template, verbatim whitespace "
    "included: the triple-quoted f-string at consumer/consumer.py:85-89 "
    "emits a leading newline, 12-space indents and a trailing "
    "newline+indent, and that exact string is the embedder input "
    "(title→source, id→synthetic CVE id, description→text prefix).",
)
def p_embed_text_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.extract import EMBED_TEXT_TEMPLATE

    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.format_string(
            EMBED_TEXT_TEMPLATE.replace("CVE ID: %s", "CVE ID: CVE-2024-%s"),
            F.col("source"),
            F.col("doc_id").cast("string"),
            F.substring("text", 1, 100),
        ).alias("embed_text"),
    )


@register(
    "p_query_rewrite",
    """
    SELECT doc_id,
           CASE WHEN q LIKE '%CVE-%'
                THEN q || ' Include technical details, severity, and specific mitigation steps if available.'
                ELSE q END AS enhanced
    FROM (SELECT doc_id, substring(text, 1, 80) AS q FROM documents)
    """,
    "P9 — conditional query rewrite (chatbot/main.py:105-109): append "
    "the reference's exact instruction suffix only when the text "
    "mentions a CVE id. Pure when/contains/concat column logic.",
)
def p_query_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("q")
    )
    return docs.select("doc_id", enhance_query(F.col("q")).alias("enhanced"))


_SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_SQL_SHINGLES = f"""
    list_distinct(CASE WHEN len({_SQL_TOKS}) >= 3 THEN
        list_transform(range(0, greatest(len({_SQL_TOKS}) - 3, 0) + 1),
                       i -> array_to_string(list_slice({_SQL_TOKS}, i + 1, i + 3), ' '))
        ELSE [] END)
"""


@register(
    "d_minhash_md5_signatures",
    f"""
    SELECT doc_id,
           {', '.join(
               f"list_min(list_transform({_SQL_SHINGLES}, s -> md5(CAST({i} AS VARCHAR) || '|' || s))) AS mh_{i}"
               for i in range(8)
           )}
    FROM documents
    """,
    "MinHash signature core, value-verified: 8 portable hash functions "
    "(md5 of seed||shingle, min over 3-gram shingles) reproduced "
    "independently by the oracle — upgrades the dedup pipeline's "
    "signature math from rows-only to hash-checked. Production uses "
    "the 64-bit xxhash64 variant (operators/dedup.py) — same algebra, "
    "cheaper hash.",
)
def d_minhash_md5_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_md5_slots

    docs = spread(table(spark, sf_dir, "documents"))

    # ONE Arrow kernel pass for all 8 slots straight from text
    # (value-equal to the HOF md5 form the oracle replays) — VERDICT
    # r7 #3.
    mh8 = minhash_md5_slots(8)
    return docs.select("doc_id", mh8(F.col("text")).alias("__mh")).select(
        "doc_id", *[F.col("__mh").getItem(i).alias(f"mh_{i}") for i in range(8)]
    )


@register(
    "rag_answer_end_to_end",
    """
    WITH ranked AS (
        SELECT e.vec_id,
               ROUND(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(p.embedding AS DOUBLE[])) AS DOUBLE), 6) AS sim
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) p
        WHERE e.vec_id <> 0
        ORDER BY sim DESC, e.vec_id
        LIMIT 5
    ), ctx AS (
        SELECT string_agg('- CVE ID: ' || CAST(d.doc_id AS VARCHAR) || ' | ' || substring(d.text, 1, 60),
                          chr(10) ORDER BY r.sim DESC, d.doc_id) AS context,
               COUNT(*) AS n_docs
        FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
    )
    SELECT n_docs,
           'ANSWER[' || substring('Context:' || chr(10) || context || chr(10) ||
                                  'Question: What are the top CVEs?', 1, 40) || ']' AS answer
    FROM ctx
    """,
    "V7 — the full conversational-retrieval composition (SURVEY §3.2: "
    "retrieve V3 → context P4 → prompt template → LLM V6) in ONE plan, "
    "with the REAL batched llm_udf pandas UDF on the hot path (its "
    "deterministic offline fake is replayed by the oracle; wiring a "
    "live chat API swaps one injectable function, not the plan).",
)
def rag_answer_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.embed import llm_udf
    from ..operators import similarity as sim
    from .registry import _probe

    emb = table(spark, sf_dir, "embeddings")
    hits = sim.brute_force_topk(emb, "embedding", _probe(spark, sf_dir), k=5, exclude_id=0)
    docs = table(spark, sf_dir, "documents")
    ctx = (
        hits.join(F.broadcast(docs), hits.vec_id == docs.doc_id)
        .select(
            "sim",
            "doc_id",
            F.concat(
                F.lit("- CVE ID: "),
                F.col("doc_id").cast("string"),
                F.lit(" | "),
                F.substring("text", 1, 60),
            ).alias("line"),
        )
        .agg(
            F.concat_ws(
                "\n",
                F.array_sort(
                    F.collect_list(F.struct(F.negate(F.col("sim")).alias("o"), "doc_id", "line"))
                ).getField("line"),
            ).alias("context"),
            F.count("*").alias("n_docs"),
        )
    )
    prompt = F.format_string(
        "Context:\n%s\nQuestion: %s", F.col("context"), F.lit("What are the top CVEs?")
    )
    return ctx.select("n_docs", llm_udf()(prompt).alias("answer"))


_SIMHASH_VALS = f"""
    list_transform({_SQL_SHINGLES},
        s -> (instr('0123456789abcdef', md5(s)[1:1]) - 1) * 4096
           + (instr('0123456789abcdef', md5(s)[2:2]) - 1) * 256
           + (instr('0123456789abcdef', md5(s)[3:3]) - 1) * 16
           + (instr('0123456789abcdef', md5(s)[4:4]) - 1))
"""
_SIMHASH_BITS = ", ".join(
    f"CASE WHEN COALESCE(list_sum(list_transform(vals, v -> CASE WHEN (v >> {i}) & 1 = 1 THEN 1 ELSE -1 END)), 0) >= 0 THEN '1' ELSE '0' END"
    for i in range(16)
)


@register(
    "d_simhash16_portable",
    f"""
    WITH sv AS (SELECT doc_id, {_SIMHASH_VALS} AS vals FROM documents)
    SELECT doc_id, concat({_SIMHASH_BITS}) AS simhash16
    FROM sv
    """,
    "Portable 16-bit SimHash (md5-derived shingle values, per-bit "
    "±1 vote, sign → bit), value-verified by the oracle — upgrades the "
    "SimHash family's core math from rows-only to hash-checked. "
    "Production uses the 64-bit xxhash64 variant "
    "(operators/dedup.py:simhash64) — identical algebra, 4× the bits.",
)
def d_simhash16_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    docs = spread(table(spark, sf_dir, "documents"))
    vals = F.transform(
        F.col("__sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("int"),
    )

    def bit(i: int):
        def vote(acc, v):
            return acc + F.when(
                F.shiftright(v, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return F.when(
            F.aggregate(F.col("__vals"), F.lit(0), vote) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))

    return (
        docs.select("doc_id", shingles(F.col("text"), 3).alias("__sh"))
        .select("doc_id", vals.alias("__vals"))
        .select("doc_id", F.concat(*[bit(i) for i in range(16)]).alias("simhash16"))
    )


@register(
    "v_embed_hashing_check",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
        FROM documents
    ), hashed AS (
        SELECT doc_id,
               ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS h
        FROM toks
    ), vec AS (
        SELECT doc_id, CAST(h % 16 AS INT) AS b,
               SUM(CASE WHEN h >> 63 = 0 THEN 1 ELSE -1 END) AS v
        FROM hashed GROUP BY doc_id, b
    ), agg AS (
        SELECT doc_id,
               CAST(SUM(v * v) AS BIGINT) AS sumsq,
               CAST(COUNT(CASE WHEN v <> 0 THEN 1 END) AS BIGINT) AS nnz,
               CAST(COALESCE(SUM(CASE WHEN b = 0 THEN v END), 0) AS BIGINT) AS v0,
               CAST(COALESCE(SUM(CASE WHEN b = 1 THEN v END), 0) AS BIGINT) AS v1
        FROM vec GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.sumsq, 0) AS sumsq,
           COALESCE(a.nnz, 0) AS nnz,
           COALESCE(a.v0, 0) AS v0,
           COALESCE(a.v1, 0) AS v1
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    "V1/V2 — the REAL Arrow-batched embedding UDF (hashing-trick "
    "embedder, dim=16, un-normalized) verified in integer space: the "
    "oracle independently re-derives every bucket count from "
    "md5-uint64 token hashes. Verifies the exact UDF math a model "
    "swap would replace — the plumbing (batching, array<float> "
    "column, schema) is identical for ada-002/MiniLM.",
)
def v_embed_hashing_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.embed import embedding_udf, hashing_embedder

    # min_partitions=8: pandas-UDF stage (see mm_media_features note).
    docs = spread(table(spark, sf_dir, "documents"), min_partitions=8)
    udf = embedding_udf(hashing_embedder(dim=16, normalize=False), dim=16)
    vec_int = F.transform(F.col("__vec"), lambda v: v.cast("long"))
    return (
        docs.select("doc_id", udf(F.col("text")).alias("__vec"))
        .select("doc_id", vec_int.alias("__vi"))
        .select(
            "doc_id",
            F.aggregate(F.col("__vi"), F.lit(0).cast("long"), lambda a, v: a + v * v).alias("sumsq"),
            F.size(F.filter(F.col("__vi"), lambda v: v != 0)).cast("long").alias("nnz"),
            F.element_at(F.col("__vi"), 1).alias("v0"),
            F.element_at(F.col("__vi"), 2).alias("v1"),
        )
    )
