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
