"""Structured-Streaming ingest pipeline (SURVEY §3.1, §2.11).

The reference's ingest is: Kafka topic ``cve`` consumed twice under two
group ids — one consumer lands raw JSON in the warehouse, the other
extracts/embeds/upserts vectors (``airflow/dags/etl.py:125-138``,
``airflow/dags/src/consumer.py:129-158``). Spark restatement: ONE
``readStream``, one ``foreachBatch`` that computes the batch once and
writes both sinks (W5) with per-sink error isolation via a quarantine
table (W7) — the batch is never failed by a bad record, matching the
reference's log-and-continue semantics (``processor.py:65-66``,
``consumer/consumer.py:123-125``).

Kafka and file sources share the same downstream plan; the file source
is also the broker-free test/emulation path (TESTDATA has no broker).
Delivery: Spark checkpoints offsets itself → exactly-once into
idempotent sinks, an upgrade over the reference's auto-commit
at-least-once (W2, ``consumer/consumer.py:22,45``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import extract as ex
from ..schemas import CVE_CORE_SCHEMA
from ..sinks import append_parquet, quarantine_append


def kafka_source_options(
    brokers: str, topic: str = "cve", starting_offsets: str = "earliest"
) -> dict[str, str]:
    """S4 option surface, reference parity with ``consumer/main.py:17-24``
    / ``consumer/consumer.py:40-49``: subscribe to the ``cve`` topic from
    the earliest offset. Factored out so the surface is unit-testable
    without a broker (the sandbox has none)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def cve_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "cve",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S4 — Kafka JSON source (consumer/consumer.py:40-49: subscribe,
    earliest offset). Value bytes → raw JSON string column ``raw`` plus
    the parsed typed core — identical schema to ``cve_file_stream`` so
    the rest of the pipeline is source-agnostic."""
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(brokers, topic, starting_offsets))
        .load()
        .select(F.col("value").cast("string").alias("raw"))
    )
    return _with_parsed_core(raw)


def cve_file_stream(spark: SparkSession, json_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """S3/S5 — file-source stream over a directory of CVE JSON documents
    (one per file, like the producer's extracted_files/deltaCves). The
    micro-batch file source emulates the Kafka poll loop (W1) without a
    broker; ``availableNow`` triggering gives S6 drain semantics."""
    reader = spark.readStream.schema("value string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = (
        reader.text(json_dir)
        # one JSON document may span lines; wholetext would be per-file —
        # fixture files are single-line JSON, matching Kafka's 1 msg/record
        .select(F.col("value").alias("raw"))
    )
    return _with_parsed_core(raw)


def _with_parsed_core(raw: DataFrame) -> DataFrame:
    """from_json with the typed core schema; unparseable records keep
    raw text and a null struct (never-throw, P1 semantics)."""
    return raw.withColumn("cve", F.from_json(F.col("raw"), CVE_CORE_SCHEMA))


def extract_warehouse_rows(batch: DataFrame) -> DataFrame:
    """K1 projection — the Snowflake row shape (processor.py:49-52):
    (cve_id, date_updated, date_published, raw json)."""
    cve = F.col("cve")
    upd, pub = ex.cve_dates(cve)
    return batch.select(
        ex.cve_id(cve).alias("cve_id"),
        F.to_timestamp(upd).alias("date_updated"),
        F.to_timestamp(pub).alias("date_published"),
        F.col("raw").alias("data"),
    )


def extract_embedding_rows(batch: DataFrame, embed_fn: Callable[[DataFrame, str], DataFrame] | None = None) -> DataFrame:
    """K2 projection — embedding text (P3) + 6-field metadata (P2)
    (consumer/consumer.py:76-125). ``embed_fn(df, text_col)`` plugs in
    the embedding UDF (V1/V2) and must add an ``embedding`` column; by
    default rows are produced without vectors (embedding-model-agnostic
    plumbing — the reference hard-codes ada-002, we keep the dim a
    property of the data)."""
    cve = F.col("cve")
    upd, pub = ex.cve_dates(cve)
    out = batch.select(
        ex.cve_id(cve).alias("cve_id"),
        pub.alias("published_date"),
        upd.alias("updated_date"),
        ex.cve_severity(cve).alias("severity"),
        ex.cve_score(cve).alias("score"),
        ex.cve_cwe_id(cve).alias("cwe_id"),
        ex.embedding_text(cve).alias("text"),
    )
    if embed_fn is not None:
        out = embed_fn(out, "text")
    return out


def run_dual_sink_ingest(
    stream: DataFrame,
    warehouse_path: str,
    vectors_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    embed_fn: Callable[[DataFrame, str], DataFrame] | None = None,
    expectations=None,
):
    """W5 dual-sink ingest: one micro-batch → warehouse append + vector
    table append, each isolated by a try/except that quarantines the
    failing batch instead of failing the query (W7 dead-letter).

    Records with an unparseable/absent cve_id go to quarantine, matching
    the reference's per-record error isolation — but set-at-a-time.
    ``expectations`` (optional ``{name: pass-Column}`` mapping,
    ``operators/quality.py`` semantics) adds declarative data-quality
    gating on top: rows violating any rule are quarantined with the
    violated rule names as the reason, clean rows flow to both sinks —
    the DLT-style expectations-on-ingest pattern.
    """

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()  # computed once, written twice (W5)
        try:
            ok = batch.filter(F.col("cve").isNotNull() & (ex.cve_id(F.col("cve")) != ""))
            bad = batch.filter(F.col("cve").isNull() | (ex.cve_id(F.col("cve")) == ""))
            if expectations:
                from ..operators.quality import split_by_expectations

                ok, violated = split_by_expectations(ok, expectations)
                if violated.limit(1).count() > 0:
                    # quarantine schema stays (raw, reason, ts) — per-rule
                    # detail comes from expectation_report, not the DLQ
                    quarantine_append(
                        violated.select("raw"),
                        quarantine_path,
                        reason="expectation_failed",
                    )
            try:
                append_parquet(extract_warehouse_rows(ok), warehouse_path)
            except Exception:  # noqa: BLE001 — W7: never fail the query
                quarantine_append(ok.select("raw"), quarantine_path, reason="warehouse_write_failed")
            try:
                append_parquet(extract_embedding_rows(ok, embed_fn), vectors_path)
            except Exception:  # noqa: BLE001
                quarantine_append(ok.select("raw"), quarantine_path, reason="embed_write_failed")
            if bad.limit(1).count() > 0:
                quarantine_append(bad.select("raw"), quarantine_path, reason="unparseable")
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(write_batch).option("checkpointLocation", checkpoint_dir)
    if available_now:
        # S6/W4 — drain everything available, then stop (the reference's
        # scheduled-drain consumer, airflow/dags/src/consumer.py:129-158)
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")  # W1 poll cadence
    return writer.start()
