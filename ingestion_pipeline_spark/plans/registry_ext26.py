"""Twenty-sixth registry tranche: the Python UDTF surface (§2.12).

``x_udtf_cve_refs`` re-expresses the CVE-reference fan-out (the
reference's grype-match explode, ``sources/scan.py:grype_matches``)
through Spark 4's native Python UDTF API — one input row yields N
output rows from imperative Python, the general escape hatch when a
fan-out cannot be written as explode-of-an-expression.

Deliberately NOT the hot path: a Python UDTF is row-at-a-time (no
Arrow batching), so the engine's production fan-outs stay on
``explode``/``posexplode`` (codegen) or ``mapInPandas`` (Arrow). The
gate exists to verify the API surface end-to-end with a value-hash
oracle; its doc is the warning label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_tables import table
from .registry import register


@register(
    "x_udtf_cve_refs",
    r"""
    WITH synth AS (
        SELECT doc_id,
               'issues CVE-2024-' || CAST(1000 + doc_id AS VARCHAR)
               || ' and CVE-2023-' || CAST(2000 + doc_id AS VARCHAR) AS blob
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, unnest(regexp_extract_all(blob, 'CVE-\d{4}-\d{4,7}')) AS cve_ref,
           generate_subscripts(regexp_extract_all(blob, 'CVE-\d{4}-\d{4,7}'), 1) - 1 AS pos
    FROM synth
    """,
    "Python UDTF fan-out (§2.12): one row in, N (cve_ref, pos) rows "
    "out via imperative Python — Spark 4's native table-function API, "
    "verified against the regex-unnest oracle. Row-at-a-time (no "
    "Arrow), so production fan-outs stay on explode/mapInPandas; this "
    "gate pins the API surface, not a hot path.",
)
def x_udtf_cve_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="cve_ref: string, pos: int")
    class ExtractCves:
        def eval(self, blob: str):
            for i, m in enumerate(re.findall(r"CVE-\d{4}-\d{4,7}", blob or "")):
                yield m, i

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    synth = docs.select(
        "doc_id",
        F.concat(
            F.lit("issues CVE-2024-"),
            (F.lit(1000) + F.col("doc_id")).cast("string"),
            F.lit(" and CVE-2023-"),
            (F.lit(2000) + F.col("doc_id")).cast("string"),
        ).alias("blob"),
    )
    synth.createOrReplaceTempView("__udtf_in")
    spark.udtf.register("extract_cves", ExtractCves)
    return spark.sql(
        "SELECT doc_id, t.cve_ref, t.pos "
        "FROM __udtf_in, LATERAL extract_cves(blob) t"
    )
