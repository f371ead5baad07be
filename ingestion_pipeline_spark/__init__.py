"""ingestion_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
CVE ingestion pipeline (`cve-data-engineering/ingestion-pipeline`) as an
idiomatic Spark DataFrame / SQL / Structured Streaming library, designed
for 100 TB scale:

- ``sources``   — batch + streaming source adapters (parquet tables, JSON
  dirs, file-emulated Kafka, subprocess scanners, REST enrichment).
- ``functions`` — column-level function library: never-throw nested JSON
  extraction, text/regex ops, vector math, confidence scoring.
- ``operators`` — DataFrame→DataFrame operators: relational query
  builders, top-k similarity, dedup family, multimodal plumbing.
- ``streaming`` — Structured Streaming pipelines: dual-sink foreachBatch,
  idle-timeout stop, quarantine (dead-letter) handling.
- ``plans``     — the query registry binding every operator to a named
  query + DuckDB oracle for differential testing.

Everything is declarative DataFrame code so Catalyst handles pushdown,
pruning, join planning and AQE; Python UDFs appear only where semantics
require them (and then always Arrow-batched).
"""

__version__ = "0.1.0"
