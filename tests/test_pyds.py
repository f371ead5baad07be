"""Python Data Source connector: partitioned read, options, determinism."""

from __future__ import annotations

from ingestion_pipeline_spark.sources.pyds import (
    NvdRestReader,
    fake_nvd_records,
    register_nvd_source,
)


def test_nvd_source_partitioned_read(spark):
    register_nvd_source(spark)
    df = (
        spark.read.format("nvd_rest")
        .option("start_year", 2021)
        .option("end_year", 2023)
        .option("per_year", 10)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 20
    assert {r["year"] for r in rows} == {2021, 2022}
    assert all(r["cve_id"] == f"CVE-{r['year']}-{1000 + r['seq']}" for r in rows)
    sevs = {r["base_severity"] for r in rows}
    assert sevs <= {"CRITICAL", "HIGH", "MEDIUM", "LOW", "NONE"}


def test_nvd_reader_one_partition_per_year():
    reader = NvdRestReader({"start_year": "2020", "end_year": "2024", "per_year": "5"})
    parts = reader.partitions()
    assert [p.year for p in parts] == [2020, 2021, 2022, 2023]
    assert list(reader.read(parts[0])) == list(fake_nvd_records(2020, 5))


def test_nvd_source_streaming_micro_batches(spark, tmp_path):
    """Streaming face of the connector: one year slice per micro-batch,
    offsets advance by year, the drained source stops emitting, and the
    total equals the batch read of the same range."""
    import time

    register_nvd_source(spark)
    stream = (
        spark.readStream.format("nvd_rest")
        .option("start_year", 2021)
        .option("end_year", 2023)
        .option("per_year", 10)
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("nvd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM nvd_stream").first()["c"] >= 20:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM nvd_stream").collect()
    finally:
        q.stop()
    assert len(rows) == 20
    assert {r["year"] for r in rows} == {2021, 2022}
    # stream total == batch read of the same option range
    batch = (
        spark.read.format("nvd_rest")
        .option("start_year", 2021)
        .option("end_year", 2023)
        .option("per_year", 10)
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch))
