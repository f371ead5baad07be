"""Container-scan sources (SURVEY §2.1 S7/S8; scanner/scan.py).

The reference shells out to ``syft``/``grype`` per image and keeps the
parsed JSON in per-image dicts (``scanner/scan.py:19-34,65-95``). Spark
restatement: the image list is a DataFrame; the scan is a batched
``mapInPandas`` over it (executor-side subprocess fan-out — scans are
embarrassingly parallel); results are typed rows, and the reference's
dict lookups become filters/joins on the ``image`` column.

The scanner binaries are not in this container, so the subprocess
runner is injectable: tests pass a deterministic fake; production uses
``_run_scanner`` unchanged.
"""

from __future__ import annotations

import json
import subprocess
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

SCAN_RESULT_SCHEMA = StructType(
    [
        StructField("image", StringType()),
        StructField("tool", StringType()),
        StructField("raw_json", StringType()),
    ]
)


def _run_scanner(tool: str, image: str) -> str:
    """Production runner — syft_scan/grype_scan (scanner/scan.py:65-95).

    Raises NotImplementedError here because the binaries are not baked
    into this environment; the call shape matches the reference CLI:
    ``syft scan registry:<image> --output cyclonedx-json`` /
    ``grype registry:<image> -o json``.
    """
    argv = (
        ["syft", "scan", f"registry:{image}", "--output", "cyclonedx-json"]
        if tool == "syft"
        else ["grype", f"registry:{image}", "-o", "json"]
    )
    try:
        proc = subprocess.run(argv, capture_output=True, text=True, timeout=600, check=True)  # noqa: S603
    except FileNotFoundError as e:  # binary absent in this container
        raise NotImplementedError(f"{tool} binary not available: install to enable live scans") from e
    return proc.stdout


def scan_images(
    images: DataFrame,
    tool: str,
    runner: Callable[[str, str], str] = _run_scanner,
) -> DataFrame:
    """S7/S8 — fan a scanner subprocess across the image list. One task
    per partition batch; per-image failure yields an error row instead
    of failing the job (scanner/scan.py wraps scans in try/except)."""

    def scan_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image in pdf["image_url"]:
                try:
                    raw = runner(tool, image)
                except Exception as e:  # noqa: BLE001 — per-record isolation
                    raw = json.dumps({"error": str(e)})
                rows.append({"image": image, "tool": tool, "raw_json": raw})
            yield pd.DataFrame(rows, columns=["image", "tool", "raw_json"])

    return images.mapInPandas(scan_partition, SCAN_RESULT_SCHEMA)


def grype_matches(scans: DataFrame) -> DataFrame:
    """Parse grype output and fan out matches (UDTF-equivalent explode —
    scanner/scan.py:53-62): one row per (image, vulnerability id,
    severity)."""
    from ..schemas import GRYPE_SCHEMA

    parsed = scans.withColumn(
        "doc", F.from_json(F.col("raw_json"), GRYPE_SCHEMA.add("error", StringType()))
    )
    return (
        parsed.select("image", F.explode_outer(F.col("doc.matches")).alias("m"))
        .select(
            "image",
            F.col("m.vulnerability.id").alias("vuln_id"),
            F.col("m.vulnerability.severity").alias("severity"),
        )
        .filter(F.col("vuln_id").isNotNull())
    )


def cve_ids_per_image(matches: DataFrame) -> DataFrame:
    """F1+G2 — CVE-prefixed ids per image (scanner/scan.py:53-62):
    startswith filter then collect per image."""
    return (
        matches.filter(F.col("vuln_id").startswith("CVE"))
        .groupBy("image")
        .agg(F.sort_array(F.collect_set("vuln_id")).alias("cve_ids"), F.count("*").alias("n_matches"))
    )


def lookup_cve(matches: DataFrame, cve_id: str) -> DataFrame:
    """F2 — equality lookup of one CVE across images
    (scanner/scan.py:42-46)."""
    return matches.filter(F.col("vuln_id") == cve_id)
