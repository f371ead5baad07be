"""Interchange-format connectors: CSV, JSON-lines, ORC (SURVEY §2.1
breadth — the reference exchanges data as JSON files and warehouse rows;
real pipelines also land CSV/JSONL drops and keep ORC/parquet archives).

Design rules, all scale-motivated:

- **Explicit schema always.** ``inferSchema`` re-reads the whole input
  on the driver's schedule before the real scan — at 100 TB that is a
  second full pass. Every reader here takes a ``StructType`` (or reuses
  a table's known schema) so the single scan is the only scan. CSV/JSON
  scans stay splittable per-file and parallelize across the directory.
- **Quoted/escaped CSV round-trips.** Free-text columns (document
  bodies) contain newlines, quotes and delimiters; writers emit RFC-ish
  quoting (quote-all + escaped quotes, ``multiLine`` readers) so a
  CSV round-trip is byte-identical, not merely usually-right.
- **Corrupt-record quarantine, not job failure.** JSONL readers run
  PERMISSIVE with a ``_corrupt_record`` column the caller can route to
  the dead-letter sink (W7 semantics, sinks.quarantine_append) — one
  malformed line in a 100 TB drop must not kill the run.
- **ORC keeps the columnar contract.** Predicate pushdown + column
  pruning work like parquet (Catalyst emits the same PushedFilters);
  useful when an upstream warehouse exports ORC.

Compression defaults: zstd for ORC (parquet parity), gzip for CSV/JSONL
text drops (splittability lost on gzip — acceptable for landing zones,
document it; use uncompressed or many small files when scans must
split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Microsecond-precision timestamp formats: the writer defaults truncate
# to millis, which silently breaks event-time round-trips.
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}

CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",  # free-text fields may embed newlines
    # quoteAll + emptyValue + a \N null sentinel: '' round-trips as a
    # quoted empty field, NULL as \N — the two stay distinguishable
    # (without the sentinel the writer emits "" for BOTH)
    "quoteAll": "true",
    "emptyValue": "",
    "nullValue": "\\N",
    **_TS_OPTS,
}


def write_csv(df: DataFrame, path: str, compression: str | None = None) -> None:
    w = df.write.mode("overwrite").options(**CSV_OPTS)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Explicit-schema CSV scan (never inferSchema — see module doc)."""
    return spark.read.options(**CSV_OPTS).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    w = df.write.mode("overwrite").options(**_TS_OPTS)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE JSON-lines scan: malformed lines land in
    ``corrupt_col`` (route them to the quarantine sink; W7) instead of
    failing the scan."""
    # StructType.add MUTATES self (and returns it) — extending the
    # caller's schema in place would leave `_corrupt_record` in their
    # object for later writes/CSV reads (round-2 advisor finding).
    # Copy the fields before extending.
    full = (
        StructType(list(schema.fields)).add(corrupt_col, "string")
        if corrupt_col not in schema.names
        else schema
    )
    return (
        spark.read.schema(full)
        .options(**_TS_OPTS)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_evolving_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution scan: one logical table whose files were written
    across schema generations (columns added over time — the normal
    state of a years-old 100 TB archive). ``mergeSchema`` unions the
    footer schemas at planning time; files lacking a column read NULL
    for it. Costs one footer pass over the file listing — enable it
    per-read like this, not globally."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def union_evolving(*dfs: DataFrame) -> DataFrame:
    """Positional-blind union across schema generations:
    ``unionByName(allowMissingColumns=True)`` folds any number of
    frames, null-filling columns absent on either side. The in-memory
    counterpart of ``read_evolving_parquet`` for sources that arrive as
    separate DataFrames (e.g. per-day landing dirs)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
