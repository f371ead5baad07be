"""W6 streaming windows: watermarked tumbling windows, session windows,
and the applyInPandasWithState custom stateful operator — run through a
real file-source stream (Kafka emulation, no broker) with availableNow
drain, plus batch/stream equivalence."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ingestion_pipeline_spark.streaming import (
    session_window_rollup,
    stateful_user_totals,
    windowed_event_counts,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"

ROWS = [
    # user 1: two sessions (gap > 30 min between 10:10 and 11:00)
    (1, "2024-03-01T10:00:00", 1, "click", 1.0),
    (2, "2024-03-01T10:10:00", 1, "click", 2.0),
    (3, "2024-03-01T11:00:00", 1, "purchase", 3.0),
    # user 2: one session spanning two hourly windows
    (4, "2024-03-01T10:55:00", 2, "view", 4.0),
    (5, "2024-03-01T11:05:00", 2, "view", 5.0),
]


@pytest.fixture()
def event_stream(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    for r in ROWS:
        rec = dict(zip(["event_id", "ts", "user_id", "event_type", "value"], r))
        (src / f"e{r[0]}.json").write_text(json.dumps(rec))
    return spark.readStream.schema(EVENT_SCHEMA).json(str(src))


def _drain(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_streaming(spark, event_stream):
    _drain(
        windowed_event_counts(event_stream, window_len="1 hour"),
        "win_counts", "complete",
    )
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[(10, "click")] == (2, 3.0)
    assert got[(10, "view")] == (1, 4.0)
    assert got[(11, "view")] == (1, 5.0)
    assert got[(11, "purchase")] == (1, 3.0)


def test_session_windows_streaming_matches_batch(spark, event_stream):
    _drain(session_window_rollup(event_stream), "sess_rollup", "complete")
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sess_rollup").collect()
    }
    batch_df = spark.createDataFrame(
        [(i, ts, u, et, v) for (i, ts, u, et, v) in
         [(r[0], __import__("datetime").datetime.fromisoformat(r[1]), r[2], r[3], r[4]) for r in ROWS]],
        EVENT_SCHEMA,
    )
    batched = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in session_window_rollup(batch_df).collect()
    }
    assert streamed == batched
    assert len({s for s in streamed if s[0] == 1}) == 2  # user 1 split into 2 sessions


def test_stateful_user_totals_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    for r in ROWS:
        rec = dict(zip(["event_id", "ts", "user_id", "event_type", "value"], r))
        (src / f"e{r[0]}.json").write_text(json.dumps(rec))
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .json(str(src))
    )
    _drain(stateful_user_totals(stream), "user_totals", "update")
    # last update per user reflects state carried across micro-batches
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY n_events DESC) rn FROM user_totals) WHERE rn = 1"
        ).collect()
    }
    assert final[1] == (3, 6.0)
    assert final[2] == (2, 9.0)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    """W6 late-data semantics: once the watermark passes a window's end,
    rows for that window are dropped, and append mode emits the
    finalized window WITHOUT them."""
    src = tmp_path / "late_ev"
    src.mkdir()

    def write(name, event_id, ts, value):
        rec = {"event_id": event_id, "ts": ts, "user_id": 1,
               "event_type": "click", "value": value}
        (src / name).write_text(json.dumps(rec))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 10)
        .json(str(src))
    )
    counts = windowed_event_counts(stream, window_len="1 hour", watermark="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .start()
    )
    try:
        # batch 1: one row in the 10:00 window + a 12:00 row that drags
        # the watermark to 11:50
        write("b1a.json", 1, "2024-03-01T10:05:00", 1.0)
        write("b1b.json", 2, "2024-03-01T12:00:00", 1.0)
        q.processAllAvailable()
        # batch 2: a LATE row for the already-closed 10:00 window
        # (end 11:00 < watermark 11:50) + a fresh row to trigger work
        write("b2a.json", 3, "2024-03-01T10:10:00", 100.0)
        write("b2b.json", 4, "2024-03-01T12:05:00", 1.0)
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = {
        r["window_start"].hour: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM late_counts").collect()
    }
    # the 10:00 window finalized with ONLY the on-time row
    assert emitted[10] == (1, 1.0)


def test_transform_with_state_matches_applyinpandas(spark, tmp_path):
    """The transformWithStateInPandas successor API must produce the
    same final per-user totals as the applyInPandasWithState operator,
    with state carried across micro-batches either way. The API's
    Python<->JVM state server speaks protobuf, which this sandbox
    doesn't ship — skip (not fail) there; the operator itself builds
    against the documented API either way (see
    test_transform_with_state_operator_builds)."""
    pytest.importorskip("google.protobuf")
    from ingestion_pipeline_spark.streaming import stateful_user_totals_tws

    src = tmp_path / "ev_tws"
    src.mkdir()
    for r in ROWS:
        rec = dict(zip(["event_id", "ts", "user_id", "event_type", "value"], r))
        (src / f"e{r[0]}.json").write_text(json.dumps(rec))
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .json(str(src))
    )
    _drain(stateful_user_totals_tws(stream), "user_totals_tws", "update")
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY n_events DESC) rn FROM user_totals_tws) WHERE rn = 1"
        ).collect()
    }
    assert final[1] == (3, 6.0)
    assert final[2] == (2, 9.0)


def test_transform_with_state_operator_builds(spark, tmp_path):
    """Sandbox-safe assertion for the transformWithState surface: the
    operator must construct its streaming plan (API names, output
    schema, grouping) without executing — execution needs protobuf
    (see skip above)."""
    src = tmp_path / "ev_tws_build"
    src.mkdir()
    (src / "e1.json").write_text(
        json.dumps({"event_id": 1, "ts": "2024-03-01T10:00:00", "user_id": 1,
                    "event_type": "click", "value": 1.0}))
    from ingestion_pipeline_spark.streaming import stateful_user_totals_tws

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    df = stateful_user_totals_tws(stream)
    assert df.isStreaming
    assert df.columns == ["user_id", "n_events", "total_value"]
    assert "TransformWithStateInPySpark" in df._jdf.queryExecution().logical().toString()
