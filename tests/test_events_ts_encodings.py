"""Regression for the events.ts fixture-schema family (VERDICT r1 #1).

The driver's fixture generator has shipped ``ts`` as TIMESTAMP(NANOS),
TIMESTAMP(MICROS, isAdjustedToUTC=false) (→ Spark TimestampNTZ), and may
ship adjusted MICROS (→ TimestampType).  ``parquet_tables._events`` must
normalize all three to session-TZ TimestampType so every
``unix_micros(ts)`` consumer (g_events_stats, sessionize, rollups,
stream watermarks) resolves.  Round 1 lost 5 correctness entries and the
entire bench to the NTZ case — this test pins all encodings.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

UTC = datetime.timezone.utc
ROWS = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0, 123456), 10, "click", 1.5, "{}"),
    (2, datetime.datetime(2024, 1, 1, 0, 0, 1, 654321), 11, "view", 2.5, "{}"),
]
EXPECTED_US = [
    int(r[1].replace(tzinfo=UTC).timestamp() * 1_000_000) for r in ROWS
]


def _write(tmpdir: str, ts_arrow_type: pa.DataType) -> str:
    cols = list(zip(*ROWS))
    tbl = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], ts_arrow_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("ns"),          # old fixtures: Spark reads as long via legacy conf
        pa.timestamp("us"),          # current fixtures: Spark infers TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # adjusted: Spark reads TimestampType directly
    ],
    ids=["nanos", "micros_ntz", "micros_utc"],
)
def test_events_ts_normalized(spark, tmp_path, arrow_type):
    from ingestion_pipeline_spark.sources.parquet_tables import table

    d = _write(str(tmp_path), arrow_type)
    df = table(spark, d, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [
        r["us"]
        for r in df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == EXPECTED_US


def test_real_fixture_unix_micros(spark, sf_dir):
    """The actual driver fixture must survive the whole time family."""
    from ingestion_pipeline_spark.sources.parquet_tables import table

    df = table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    n = (
        df.select(F.unix_micros("ts").alias("us"), F.window("ts", "1 hour"))
        .where(F.col("us").isNotNull())
        .count()
    )
    assert n > 0
