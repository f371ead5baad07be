"""Stream-stream interval join + watermarked streaming dedup: the same
builders that pass the batch oracle (`w_click_purchase_attribution`)
must produce identical rows when run as a real watermarked streaming
query over a file-source stream."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ingestion_pipeline_spark.streaming.joins import (
    clicks_to_purchases,
    dedup_within_watermark,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

ROWS = [
    # user 1: two clicks then a purchase 20/10 min later -> both attribute
    (1, "2024-03-01T10:00:00", 1, "click", 0.0),
    (2, "2024-03-01T10:10:00", 1, "click", 0.0),
    (3, "2024-03-01T10:20:00", 1, "purchase", 9.5),
    # user 2: purchase 60 min after the click -> outside the 30 min gap
    (4, "2024-03-01T11:00:00", 2, "click", 0.0),
    (5, "2024-03-01T12:00:00", 2, "purchase", 7.0),
    # user 3: purchase before any click -> no match
    (6, "2024-03-01T09:00:00", 3, "purchase", 1.0),
]


def _write_events(tmp_path, rows, subdir="events"):
    src = tmp_path / subdir
    src.mkdir()
    for r in rows:
        rec = dict(zip(["event_id", "ts", "user_id", "event_type", "value"], r))
        (src / f"e{r[0]}.json").write_text(json.dumps(rec))
    return str(src)


def _drain(df, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    src = _write_events(tmp_path, ROWS)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    _drain(clicks_to_purchases(stream), "attrib_stream")
    got = {
        (r["click_id"], r["purchase_id"], r["gap_us"])
        for r in spark.sql("SELECT * FROM attrib_stream").collect()
    }
    assert got == {(1, 3, 20 * 60 * 1_000_000), (2, 3, 10 * 60 * 1_000_000)}

    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    batch_rows = {
        (r["click_id"], r["purchase_id"], r["gap_us"])
        for r in clicks_to_purchases(batch).collect()
    }
    assert batch_rows == got


def test_dedup_within_watermark_drops_redeliveries(spark, tmp_path):
    rows = [
        (10, "2024-03-01T10:00:00", 1, "click", 1.0),
        (10, "2024-03-01T10:00:00", 1, "click", 1.0),  # exact redelivery
        (10, "2024-03-01T10:05:00", 1, "click", 1.0),  # same id, later ts
        (11, "2024-03-01T10:01:00", 2, "view", 2.0),
    ]
    src = tmp_path / "dup_events"
    src.mkdir()
    for i, r in enumerate(rows):
        rec = dict(zip(["event_id", "ts", "user_id", "event_type", "value"], r))
        (src / f"e{i}.json").write_text(json.dumps(rec))

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
    _drain(deduped, "dedup_stream")
    ids = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_stream").collect()]
    assert sorted(ids) == [10, 11]

    batch = spark.read.schema(EVENT_SCHEMA).json(str(src))
    assert dedup_within_watermark(batch, ["event_id"]).count() == 2


def test_stream_to_static_dimension_enrichment(spark, tmp_path):
    """Stream-static join (S11 under streaming): each micro-batch of the
    event stream broadcast-joins a static dimension table — no state
    store, no watermark needed (the static side is re-resolvable per
    batch). Results must equal the batch join of the same inputs."""
    src = _write_events(tmp_path, ROWS, "ev_static_join")
    users = spark.createDataFrame(
        [(1, "pro"), (2, "free")], "user_id LONG, tier STRING"
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    enriched = (
        stream.join(F.broadcast(users), "user_id", "left")
        .withColumn("tier", F.coalesce("tier", F.lit("unknown")))
        .select("event_id", "user_id", "tier")
    )
    assert enriched.isStreaming
    _drain(enriched, "enriched_stream")
    got = {
        r["event_id"]: r["tier"]
        for r in spark.sql("SELECT * FROM enriched_stream").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).json(src)
    expect = {
        r["event_id"]: r["tier"]
        for r in batch.join(F.broadcast(users), "user_id", "left")
        .withColumn("tier", F.coalesce("tier", F.lit("unknown")))
        .select("event_id", "tier")
        .collect()
    }
    assert got == expect
    assert got[6] == "unknown"  # user 3 not in the dim -> sentinel
