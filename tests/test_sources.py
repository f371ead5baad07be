"""Source adapter tests: scanner fan-out, NVD enrichment, file sources."""

from __future__ import annotations

import json
import zipfile

import pyspark.sql.functions as F

from ingestion_pipeline_spark.sources import files, rest, scan


def test_scan_explode_filter_collect(spark):
    """S7/S8 → F1/F2/G2 — the scanner pipeline with injected runner.
    (Fakes are nested so cloudpickle ships them by value — module-level
    test functions aren't importable on executors.)"""

    def fake_grype(tool: str, image: str) -> str:
        if "patched" in image:
            return json.dumps({"matches": []})
        if "broken" in image:
            raise RuntimeError("scanner crashed")
        return json.dumps(
            {
                "matches": [
                    {"vulnerability": {"id": "CVE-2021-1111", "severity": "High"}},
                    {"vulnerability": {"id": "CVE-2021-2222", "severity": "Low"}},
                    {"vulnerability": {"id": "GHSA-abcd", "severity": "Low"}},
                ]
            }
        )

    images = spark.createDataFrame(
        [("docker.io/vulnerable:1",), ("docker.io/patched:1",), ("docker.io/broken:1",)],
        "image_url string",
    )
    scans = scan.scan_images(images, "grype", runner=fake_grype)
    matches = scan.grype_matches(scans)
    per_image = {r["image"]: r for r in scan.cve_ids_per_image(matches).collect()}
    # F1: GHSA filtered out; G2: sorted collect
    assert per_image["docker.io/vulnerable:1"]["cve_ids"] == ["CVE-2021-1111", "CVE-2021-2222"]
    assert "docker.io/patched:1" not in per_image       # no matches at all
    assert "docker.io/broken:1" not in per_image        # error row isolated, not fatal
    # F2 lookup
    hit = scan.lookup_cve(matches, "CVE-2021-1111").collect()
    assert len(hit) == 1 and hit[0]["severity"] == "High"


def test_nvd_fetch_and_parse(spark):
    """S9 + P6/P7 — canned fetcher, error isolation, defaults."""
    doc = {
        "cve": {
            "id": "CVE-2024-1",
            "weaknesses": [{"description": [{"value": "CWE-22"}]}],
            "metrics": {"cvssMetricV31": [{"cvssData": {"attackVector": "LOCAL", "baseSeverity": "MEDIUM", "baseScore": 5.5}}]},
            "references": [{"url": "https://nvd.example/1"}],
        }
    }

    def fetcher(cid: str) -> str:
        if cid == "CVE-2024-1":
            return json.dumps(doc)
        if cid == "CVE-2024-2":
            raise RuntimeError("api down")
        return ""

    ids = spark.createDataFrame([("CVE-2024-1",), ("CVE-2024-2",), ("CVE-2024-3",)], "cve_id string")
    parsed = {r["cve_id"]: r for r in rest.parse_nvd(rest.fetch_nvd(ids, fetcher)).collect()}
    assert parsed["CVE-2024-1"]["cwe"] == "CWE-22"
    assert parsed["CVE-2024-1"]["score"] == 5.5
    assert parsed["CVE-2024-1"]["has_remote"]
    assert not parsed["CVE-2024-2"]["has_remote"]       # fetch error isolated
    assert parsed["CVE-2024-3"]["cwe"] == ""            # default-on-missing (main.py:107-110)


def test_zip_roundtrip_and_json_dir(spark, tmp_path):
    """S1/S2/S3 with a local file:// URL — no network."""
    payload = {"cveMetadata": {"cveId": "CVE-2020-1"}}
    srcdir = tmp_path / "src"
    srcdir.mkdir()
    (srcdir / "a.json").write_text(json.dumps(payload))
    zpath = tmp_path / "dump.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(srcdir / "a.json", "deltaCves/a.json")

    fetched = files.download_zip(f"file://{zpath}", str(tmp_path / "dl" / "dump.zip"))
    out = files.extract_zip(fetched, str(tmp_path / "extracted"))
    df = files.read_cve_json_dir(spark, out)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["cve"]["cveMetadata"]["cveId"] == "CVE-2020-1"


def test_read_url_lines(spark, tmp_path):
    """S10/X9 — line list with trim and empty-line drop."""
    p = tmp_path / "image_urls.txt"
    p.write_text("docker.io/a:1\n  docker.io/b:2  \n\n")
    got = [r["image_url"] for r in files.read_url_lines(spark, str(p)).collect()]
    assert sorted(got) == ["docker.io/a:1", "docker.io/b:2"]


def test_embedding_udf_deterministic(spark):
    from ingestion_pipeline_spark.functions.embed import with_embedding

    df = spark.createDataFrame([("hello world",), ("hello world",), ("other",)], "text string")
    rows = with_embedding(df, "text", dim=32).collect()
    assert rows[0]["embedding"] == rows[1]["embedding"]
    assert rows[0]["embedding"] != rows[2]["embedding"]
    assert len(rows[0]["embedding"]) == 32
    norm = sum(v * v for v in rows[0]["embedding"]) ** 0.5
    assert abs(norm - 1.0) < 1e-5


def test_sql_entry_matches_dataframe_api(spark, sf_dir):
    from pyspark.sql import functions as F

    from ingestion_pipeline_spark.sources.parquet_tables import register_views, table

    register_views(spark, sf_dir, "orders", "customer")
    via_sql = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        """
    ).collect()
    via_df = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {(r["c_mktsegment"], r["n"]) for r in via_sql} == {
        (r["c_mktsegment"], r["n"]) for r in via_df
    }
