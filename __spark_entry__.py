"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke check, sf0.001).
``queries()`` — every implemented operator from SURVEY §2 as
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB ANSI-SQL strings (omitted for
non-SQL-expressible ops → rows-only check).

Implementation lives in ``ingestion_pipeline_spark``; this module is a
thin binding to the plan registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the RAG retrieve path (SURVEY §3.2) minus the LLM —
    probe-vector cosine top-k over the embeddings corpus, threshold
    filter, point-lookup join to documents, context-line projection
    (P4/J1/T1/V3-V5 in one plan)."""
    from ingestion_pipeline_spark.operators.similarity import brute_force_topk
    from ingestion_pipeline_spark.sources.parquet_tables import table

    emb = table(spark, SF_SMOKE, "embeddings")
    probe_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    probe = [float(x) for x in probe_row["embedding"]]
    hits = brute_force_topk(emb, "embedding", probe, k=5, exclude_id=0)
    docs = table(spark, SF_SMOKE, "documents")
    return (
        hits.join(docs, hits.vec_id == docs.doc_id)
        .select(
            "doc_id",
            "source",
            "lang",
            "sim",
            F.format_string("- CVE ID: %s | %s", F.col("doc_id").cast("string"),
                            F.substring("text", 1, 80)).alias("context_line"),
        )
        .orderBy(F.col("sim").desc(), F.col("doc_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ingestion_pipeline_spark.plans import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from ingestion_pipeline_spark.plans import oracle_sql_map

    return oracle_sql_map()
