"""Streaming tests (SURVEY §5 item 3): file-source emulation of the
Kafka ingest, availableNow drain, dual-sink routing, quarantine."""

from __future__ import annotations

import json

import pytest

from ingestion_pipeline_spark.streaming import (
    cve_file_stream,
    run_dual_sink_ingest,
    run_until_idle,
)

GOOD = [
    {
        "cveMetadata": {
            "cveId": f"CVE-2024-{1000 + i}",
            "datePublished": "2024-01-02T00:00:00",
            "dateUpdated": "2024-01-03T00:00:00",
        },
        "containers": {
            "cna": {
                "title": f"Bug {i}",
                "descriptions": [{"value": f"Description {i}"}],
                "metrics": [{"cvssV3_1": {"baseSeverity": "HIGH", "baseScore": 7.0 + i}}],
                "problemTypes": [{"descriptions": [{"cweId": "CWE-79"}]}],
            }
        },
    }
    for i in range(5)
]
BAD = ["{not valid json", json.dumps({"containers": {"cna": {"title": "no id"}}})]


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    for i, rec in enumerate(GOOD):
        (src / f"good_{i}.json").write_text(json.dumps(rec))
    for i, bad in enumerate(BAD):
        (src / f"bad_{i}.json").write_text(bad)
    return {
        "src": str(src),
        "warehouse": str(tmp_path / "warehouse"),
        "vectors": str(tmp_path / "vectors"),
        "quarantine": str(tmp_path / "quarantine"),
        "checkpoint": str(tmp_path / "ckpt"),
    }


def test_dual_sink_drain(spark, stream_dirs):
    """W5 dual sink + S6 availableNow drain + W7 quarantine."""
    from ingestion_pipeline_spark.functions.embed import with_embedding

    stream = cve_file_stream(spark, stream_dirs["src"])
    q = run_dual_sink_ingest(
        stream,
        stream_dirs["warehouse"],
        stream_dirs["vectors"],
        stream_dirs["quarantine"],
        stream_dirs["checkpoint"],
        available_now=True,
        embed_fn=lambda df, c: with_embedding(df, c, dim=16),
    )
    q.awaitTermination(120)

    wh = spark.read.parquet(stream_dirs["warehouse"])
    assert wh.count() == 5
    assert set(wh.columns) == {"cve_id", "date_updated", "date_published", "data"}
    assert wh.filter("cve_id = 'CVE-2024-1003'").count() == 1
    # timestamps parsed, raw JSON kept full-fidelity (VARIANT parity)
    row = wh.filter("cve_id = 'CVE-2024-1000'").first()
    assert row["date_published"] is not None
    assert json.loads(row["data"])["containers"]["cna"]["title"] == "Bug 0"

    vec = spark.read.parquet(stream_dirs["vectors"])
    assert vec.count() == 5
    assert set(vec.columns) == {
        "cve_id", "published_date", "updated_date", "severity", "score", "cwe_id", "text", "embedding",
    }
    vrow = vec.filter("cve_id = 'CVE-2024-1001'").first()
    assert vrow["severity"] == "HIGH"
    assert vrow["text"].startswith("Title: Bug 1\nCVE ID: CVE-2024-1001")
    assert len(vrow["embedding"]) == 16

    quar = spark.read.parquet(stream_dirs["quarantine"])
    assert quar.count() == 2  # malformed JSON + missing cve_id
    assert set(r["reason"] for r in quar.collect()) == {"unparseable"}


def test_drain_is_idempotent_via_checkpoint(spark, stream_dirs):
    """W2 upgrade: re-running the drain with the same checkpoint must not
    duplicate rows (exactly-once into the sink)."""
    for _ in range(2):
        stream = cve_file_stream(spark, stream_dirs["src"])
        q = run_dual_sink_ingest(
            stream,
            stream_dirs["warehouse"],
            stream_dirs["vectors"],
            stream_dirs["quarantine"],
            stream_dirs["checkpoint"],
            available_now=True,
        )
        q.awaitTermination(120)
    assert spark.read.parquet(stream_dirs["warehouse"]).count() == 5


def test_idle_stop_terminates_unbounded_query(spark, stream_dirs):
    """W4 — a processingTime-triggered query over a quiet source is
    stopped by the idle listener (reference: 10 s inactivity exit,
    airflow/dags/src/consumer.py:129-158; generous margins per SURVEY
    §7 hard-part 3)."""
    stream = cve_file_stream(spark, stream_dirs["src"])
    q = run_dual_sink_ingest(
        stream,
        stream_dirs["warehouse"],
        stream_dirs["vectors"],
        stream_dirs["quarantine"],
        stream_dirs["checkpoint"] + "_idle",
        available_now=False,
    )
    run_until_idle(spark, q, inactivity_timeout=5.0, max_wait=90.0)
    assert not q.isActive
    assert spark.read.parquet(stream_dirs["warehouse"]).count() == 5
