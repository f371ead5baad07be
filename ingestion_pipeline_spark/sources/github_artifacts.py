"""GitHub Actions artifact source chain (SURVEY §2.1 S10).

The reference walks the GitHub REST API to pull a CI-produced artifact:
workflow name → workflow id → latest successful run → artifact zip →
extracted line-per-URL text file
(``llama-chatbot/main.py:372-489``: ``fetch_workflow_id``,
``fetch_latest_successful_run``, ``fetch_artifact``,
``download_latest_artifact``).

Spark restatement: the API walk is a driver-side prelude (four tiny
metadata calls + one zip download — there is nothing to distribute),
and the *data* hand-off is a distributed read: the extracted file goes
through ``files.read_url_lines`` so downstream per-image processing
(S7/S8 scans, J4 lookups) runs executor-side. At scale the artifact
could list millions of image URLs; one driver-side download of the
listing followed by a distributed read of it is still the right shape —
the listing is metadata, the per-URL work is the distributed part.

HTTP is injectable (``http_get``) because this environment has no
network and no GitHub token; tests walk the full chain against canned
responses. The default implementation matches the reference's headers
(Bearer token + v3+json accept).
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

HttpGet = Callable[[str, dict[str, str]], bytes]

API_ROOT = "https://api.github.com"


def _default_http_get(url: str, headers: dict[str, str]) -> bytes:
    import urllib.request

    req = urllib.request.Request(url, headers=headers)  # noqa: S310
    with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
        return resp.read()


def _headers(token: str) -> dict[str, str]:
    # Reference parity: llama-chatbot/main.py:375-379.
    return {
        "Authorization": f"Bearer {token}",
        "Accept": "application/vnd.github.v3+json",
    }


def fetch_workflow_id(
    repo: str, token: str, workflow_name: str, http_get: HttpGet = _default_http_get
) -> int:
    """Workflow name (or path suffix) → id (main.py:372-388)."""
    payload = json.loads(
        http_get(f"{API_ROOT}/repos/{repo}/actions/workflows", _headers(token))
    )
    for wf in payload["workflows"]:
        if wf["name"] == workflow_name or wf["path"].endswith(workflow_name):
            return wf["id"]
    raise ValueError(f"Workflow '{workflow_name}' not found in repository '{repo}'.")


def fetch_latest_successful_run(
    repo: str, token: str, workflow_id: int, http_get: HttpGet = _default_http_get
) -> int:
    """First run with conclusion == success — the API returns runs newest
    first, so "first successful" is "latest successful" (main.py:391-407)."""
    payload = json.loads(
        http_get(
            f"{API_ROOT}/repos/{repo}/actions/workflows/{workflow_id}/runs",
            _headers(token),
        )
    )
    for run in payload["workflow_runs"]:
        if run["conclusion"] == "success":
            return run["id"]
    raise ValueError("No successful runs found for the specified workflow.")


def fetch_artifact(
    repo: str,
    token: str,
    run_id: int,
    artifact_name: str,
    output_dir: str = "artifacts",
    output_file: str = "image_urls.txt",
    http_get: HttpGet = _default_http_get,
) -> str:
    """Artifact by name → download zip → extract → path to the expected
    file (main.py:410-445). Raises if the artifact is absent; a missing
    *member* inside the zip surfaces when the read runs (reference only
    warns)."""
    payload = json.loads(
        http_get(
            f"{API_ROOT}/repos/{repo}/actions/runs/{run_id}/artifacts",
            _headers(token),
        )
    )
    for artifact in payload["artifacts"]:
        if artifact["name"] == artifact_name:
            blob = http_get(artifact["archive_download_url"], _headers(token))
            os.makedirs(output_dir, exist_ok=True)
            zip_path = os.path.join(output_dir, f"{artifact_name}.zip")
            with open(zip_path, "wb") as fh:
                fh.write(blob)
            with zipfile.ZipFile(zip_path) as zf:
                zf.extractall(output_dir)  # noqa: S202 — trusted CI artifact
            return os.path.join(output_dir, output_file)
    raise ValueError(f"Artifact '{artifact_name}' not found in the run.")


def download_latest_artifact(
    repo: str,
    token: str,
    workflow_name: str,
    artifact_name: str,
    output_file: str = "image_urls.txt",
    output_dir: str = "artifacts",
    http_get: HttpGet = _default_http_get,
) -> str:
    """Full chain (main.py:448-489), returning the extracted file path.
    Unlike the reference (which swallows errors and returns None), this
    raises — a missing artifact should fail the pipeline run loudly."""
    workflow_id = fetch_workflow_id(repo, token, workflow_name, http_get)
    run_id = fetch_latest_successful_run(repo, token, workflow_id, http_get)
    path = fetch_artifact(
        repo, token, run_id, artifact_name, output_dir, output_file, http_get
    )
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Extracted file '{output_file}' not found in directory '{output_dir}'."
        )
    return path


def artifact_url_lines(
    spark: SparkSession,
    repo: str,
    token: str,
    workflow_name: str,
    artifact_name: str,
    output_file: str = "image_urls.txt",
    output_dir: str = "artifacts",
    http_get: HttpGet = _default_http_get,
) -> DataFrame:
    """S10 end-to-end: API walk prelude → distributed line read
    (one trimmed non-empty ``image_url`` per row, main.py:481-484)."""
    from .files import read_url_lines

    path = download_latest_artifact(
        repo, token, workflow_name, artifact_name, output_file, output_dir, http_get
    )
    return read_url_lines(spark, path)
