"""REST enrichment source (SURVEY §2.1 S9 — NVD fetch).

The reference fetches NVD records one CVE at a time inside the request
path (``llama-chatbot/main.py:86-101``). Spark restatement: enrichment
is a *join* against an NVD-shaped table; when records must come from
the live API, a batched pandas-UDF fetcher materializes them — network
calls happen executor-side, batched, with per-record error isolation.

The HTTP fetcher is injectable (tests use canned JSON; no network in
this environment).
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

NVD_API_URL = "https://services.nvd.nist.gov/rest/json/cves/2.0?cveId={cve_id}"

FETCH_SCHEMA = StructType(
    [StructField("cve_id", StringType()), StructField("nvd_json", StringType())]
)


def _http_fetch(cve_id: str) -> str:
    """Live fetch — first element of ``vulnerabilities``
    (llama-chatbot/main.py:93-99)."""
    import urllib.request

    with urllib.request.urlopen(NVD_API_URL.format(cve_id=cve_id), timeout=30) as resp:  # noqa: S310
        payload = json.loads(resp.read())
    vulns = payload.get("vulnerabilities", [])
    return json.dumps(vulns[0]) if vulns else ""


def fetch_nvd(
    cve_ids: DataFrame,
    fetcher: Callable[[str], str] = _http_fetch,
    id_col: str = "cve_id",
) -> DataFrame:
    """S9 — batched executor-side fetch with per-record error isolation
    (missing/failed → empty string, the reference's default-on-missing)."""

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf[id_col]:
                try:
                    doc = fetcher(cid)
                except Exception:  # noqa: BLE001
                    doc = ""
                rows.append({"cve_id": cid, "nvd_json": doc})
            yield pd.DataFrame(rows, columns=["cve_id", "nvd_json"])

    return cve_ids.mapInPandas(fetch_partition, FETCH_SCHEMA)


def parse_nvd(fetched: DataFrame) -> DataFrame:
    """Typed projection of the fetched docs (P6/P7/P8 —
    llama-chatbot/main.py:107-123,148), never-throw."""
    from ..functions.extract import nvd_cvss, nvd_cwe, nvd_reference_urls
    from ..schemas import NVD_CVE_SCHEMA

    doc = F.from_json(F.col("nvd_json"), NVD_CVE_SCHEMA)
    av, sev, score = nvd_cvss(doc)
    return fetched.select(
        "cve_id",
        nvd_cwe(doc).alias("cwe"),
        av.alias("attack_vector"),
        sev.alias("severity"),
        score.alias("score"),
        nvd_reference_urls(doc).alias("reference_urls"),
        (F.col("nvd_json") != "").alias("has_remote"),
    )
