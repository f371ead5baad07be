"""File-based sources (SURVEY §2.1 S1-S3, S10).

The reference's ingestion prelude: download a zip of delta CVE JSON,
extract, walk the directory (``download.py:17-35``); plus a GitHub
artifact path that ends in a line-per-URL text file
(``llama-chatbot/main.py:372-489``). Downloads are driver-side preludes
(tiny, one archive); everything after lands in distributed reads:

- ``read_cve_json_dir``  → ``spark.read.json`` with the typed core
  schema + full-fidelity raw text (S3; recursive lookup is built in).
- ``read_url_lines``     → ``spark.read.text`` + trim (S10/X9).

At 100 TB the same entry points take directories of thousands of files;
``binaryFile`` is the scale path for opaque payloads (see multimodal).
"""

from __future__ import annotations

import os
import urllib.request
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CVE_CORE_SCHEMA


def download_zip(url: str, dest_zip: str) -> str:
    """S1 — HTTP zip download (download.py:17-22). Driver-side prelude;
    network-gated, so tests inject a local file:// URL or skip."""
    os.makedirs(os.path.dirname(dest_zip) or ".", exist_ok=True)
    urllib.request.urlretrieve(url, dest_zip)  # noqa: S310 — caller provides URL
    return dest_zip


def extract_zip(zip_path: str, dest_dir: str) -> str:
    """S2 — archive extraction (download.py:24-28)."""
    os.makedirs(dest_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest_dir)  # noqa: S202 — trusted pipeline input
    return dest_dir


def read_cve_json_dir(spark: SparkSession, json_dir: str) -> DataFrame:
    """S3 — directory scan of CVE JSON documents (download.py:30-35
    os.walk → here one recursive distributed read). Keeps the raw text
    column alongside the parsed core so storage stays full-fidelity
    (VARIANT parity — processor.py:57)."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .text(json_dir)
        .select(F.col("value").alias("raw"))
        .withColumn("cve", F.from_json(F.col("raw"), CVE_CORE_SCHEMA))
    )


def read_url_lines(spark: SparkSession, path: str) -> DataFrame:
    """S10 tail — image_urls.txt, one URL per line, trimmed (X9,
    llama-chatbot/main.py:481-484); empty lines dropped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("image_url"))
        .filter(F.col("image_url") != "")
    )
