"""Ninth registry tranche: PII redaction (training-data hygiene),
per-label embedding centroids (quantized so float averaging is
hash-exact), and the Python Data Source connector scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..sources.parquet_tables import table
from ..sources.pyds import register_nvd_source
from .registry import register

_EMAIL = tx.EMAIL_REGEX
_PHONE = tx.PHONE_REGEX


@register(
    "tx_redact_pii",
    f"""
    WITH salted AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-' || CAST(doc_id AS VARCHAR) AS txt
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(txt, '{_EMAIL}', '<EMAIL>', 'g'),
                          '{_PHONE}', '<PHONE>', 'g') AS redacted
    FROM salted
    """,
    "PII redaction pass (functions/text.py:redact_pii): every document "
    "gets a synthetic email + phone appended (so the op provably fires "
    "on every row), then emails/phones are counted and scrubbed to "
    "typed placeholders. Pure JVM regexp work — codegen'd, no Python; "
    "the audit counts ride the same scan.",
)
def tx_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    salted = docs.withColumn(
        "txt",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.col("doc_id").cast("string"),
        ),
    )
    n_emails, n_phones = tx.pii_counts(F.col("txt"))
    return salted.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        tx.redact_pii(F.col("txt")).alias("redacted"),
    )


@register(
    "v_label_centroids",
    """
    SELECT label, i - 1 AS dim,
           CAST(SUM(CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
                         AS BIGINT)) AS DOUBLE) / COUNT(*) AS centroid_q,
           COUNT(*) AS n_vectors
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i - 1
    """,
    "Per-label embedding centroid, one row per (label, dimension) — the "
    "class-prototype computation behind IVF coarse quantizers and "
    "centroid-based dedup. Components are quantized to integers "
    "(floor(x*1e6)) before summing so the distributed float reduction "
    "is associative and hash-identical to the oracle; posexplode + "
    "two-key groupBy is one shuffle of |vectors|x64 quantized ints, "
    "with map-side partial sums.",
)
def v_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return exploded.groupBy("label", "dim").agg(
        (
            F.sum(F.floor(F.col("v").cast("double") * 1_000_000).cast("long")).cast(
                "double"
            )
            / F.count("v")
        ).alias("centroid_q"),
        F.count("*").alias("n_vectors"),
    )


@register(
    "s_pyds_nvd_scan",
    """
    SELECT 'CVE-' || CAST(y AS VARCHAR) || '-' || CAST(1000 + j AS VARCHAR) AS cve_id,
           CAST(y AS INT) AS year, CAST(j AS INT) AS seq,
           CAST((y * 37 + j * 13) % 101 AS DOUBLE) / 10.0 AS base_score,
           CASE WHEN CAST((y * 37 + j * 13) % 101 AS DOUBLE) / 10.0 >= 9.0 THEN 'CRITICAL'
                WHEN CAST((y * 37 + j * 13) % 101 AS DOUBLE) / 10.0 >= 7.0 THEN 'HIGH'
                WHEN CAST((y * 37 + j * 13) % 101 AS DOUBLE) / 10.0 >= 4.0 THEN 'MEDIUM'
                WHEN CAST((y * 37 + j * 13) % 101 AS DOUBLE) / 10.0 > 0.0 THEN 'LOW'
                ELSE 'NONE' END AS base_severity,
           'CWE-' || CAST((j * 7) % 400 + 1 AS VARCHAR) AS cwe_id
    FROM range(2020, 2024) t1(y), range(0, 50) t2(j)
    """,
    "Scan through the custom Python Data Source connector "
    "(sources/pyds.py, spark.read.format('nvd_rest')): the NVD-style "
    "catalog as a partitioned read — one input partition per year, "
    "fetched executor-parallel. The deterministic offline fetcher's "
    "arithmetic is reproduced in SQL, so the connector's full "
    "partition-plan-read path is value-hash-verified.",
)
def s_pyds_nvd_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_nvd_source(spark)
    return (
        spark.read.format("nvd_rest")
        .option("start_year", 2020)
        .option("end_year", 2024)
        .option("per_year", 50)
        .load()
    )
