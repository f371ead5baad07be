"""S10 GitHub Actions artifact chain against a faked API
(reference: llama-chatbot/main.py:372-489), plus the S4 Kafka option
surface (no broker in the sandbox — the reader options ARE the
testable contract, consumer/main.py:17-24)."""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from ingestion_pipeline_spark.sources.github_artifacts import (
    artifact_url_lines,
    download_latest_artifact,
    fetch_artifact,
    fetch_latest_successful_run,
    fetch_workflow_id,
)

REPO = "acme/scanner"
TOKEN = "tok"
API = f"https://api.github.com/repos/{REPO}"


def make_fake_api(tmp_path):
    """Canned GitHub API: 2 workflows, runs newest-first with a failed
    run ahead of the successful one, one artifact zip holding
    image_urls.txt (with whitespace + blank lines to exercise X9 trim)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("image_urls.txt", "  ghcr.io/a:1  \n\nghcr.io/b:2\n")
    zip_bytes = buf.getvalue()

    responses = {
        f"{API}/actions/workflows": {
            "workflows": [
                {"id": 7, "name": "Other", "path": ".github/workflows/other.yml"},
                {
                    "id": 42,
                    "name": "Build and List Demo Docker Images",
                    "path": ".github/workflows/build.yml",
                },
            ]
        },
        f"{API}/actions/workflows/42/runs": {
            "workflow_runs": [
                {"id": 900, "conclusion": "failure"},
                {"id": 800, "conclusion": "success"},
                {"id": 700, "conclusion": "success"},
            ]
        },
        f"{API}/actions/runs/800/artifacts": {
            "artifacts": [
                {"name": "logs", "archive_download_url": "https://dl/logs"},
                {"name": "image-urls", "archive_download_url": "https://dl/urls"},
            ]
        },
    }

    calls: list[tuple[str, dict]] = []

    def http_get(url: str, headers: dict) -> bytes:
        calls.append((url, headers))
        if url == "https://dl/urls":
            return zip_bytes
        return json.dumps(responses[url]).encode()

    return http_get, calls


def test_workflow_id_by_name_and_path(tmp_path):
    http_get, _ = make_fake_api(tmp_path)
    assert fetch_workflow_id(REPO, TOKEN, "Build and List Demo Docker Images", http_get) == 42
    assert fetch_workflow_id(REPO, TOKEN, "build.yml", http_get) == 42
    with pytest.raises(ValueError, match="not found"):
        fetch_workflow_id(REPO, TOKEN, "nope.yml", http_get)


def test_latest_successful_run_skips_failures(tmp_path):
    http_get, _ = make_fake_api(tmp_path)
    assert fetch_latest_successful_run(REPO, TOKEN, 42, http_get) == 800


def test_fetch_artifact_extracts_expected_file(tmp_path):
    http_get, _ = make_fake_api(tmp_path)
    path = fetch_artifact(
        REPO, TOKEN, 800, "image-urls", str(tmp_path / "art"), "image_urls.txt", http_get
    )
    assert path.endswith("image_urls.txt")
    with pytest.raises(ValueError, match="not found in the run"):
        fetch_artifact(REPO, TOKEN, 800, "missing", str(tmp_path / "a2"), http_get=http_get)


def test_full_chain_headers_and_dataframe(spark, tmp_path):
    http_get, calls = make_fake_api(tmp_path)
    df = artifact_url_lines(
        spark,
        REPO,
        TOKEN,
        "Build and List Demo Docker Images",
        "image-urls",
        output_dir=str(tmp_path / "art"),
        http_get=http_get,
    )
    assert [r["image_url"] for r in df.collect()] == ["ghcr.io/a:1", "ghcr.io/b:2"]
    # Reference header parity on every call (main.py:375-379).
    for _, headers in calls:
        assert headers["Authorization"] == f"Bearer {TOKEN}"
        assert headers["Accept"] == "application/vnd.github.v3+json"
    # Exactly 4 HTTP calls: workflows, runs, artifacts, zip download.
    assert len(calls) == 4


def test_download_latest_artifact_raises_on_missing_member(tmp_path):
    http_get, _ = make_fake_api(tmp_path)
    with pytest.raises(FileNotFoundError):
        download_latest_artifact(
            REPO, TOKEN, "Build and List Demo Docker Images", "image-urls",
            output_file="wrong_name.txt", output_dir=str(tmp_path / "art"),
            http_get=http_get,
        )


def test_kafka_source_option_surface():
    from ingestion_pipeline_spark.streaming.pipeline import kafka_source_options

    opts = kafka_source_options("broker:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "cve",
        "startingOffsets": "earliest",
    }
