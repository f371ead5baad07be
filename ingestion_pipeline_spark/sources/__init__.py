from .parquet_tables import TABLE_NAMES, table, tables  # noqa: F401
