"""SQL front-end parity: the same warehouse exposed through
``register_views`` answers plain ANSI SQL with results identical to the
DataFrame-built plans — one Catalyst optimizer, two front ends. The SQL
strings used here are the queries' own DuckDB oracle texts (ANSI subset
only), so this also demonstrates oracle portability.
"""

from __future__ import annotations

import pytest

from ingestion_pipeline_spark.plans import oracle_sql_map, query_map
from ingestion_pipeline_spark.sources.parquet_tables import register_views

# Oracle strings that are pure ANSI (no DuckDB list/lambda/'//' dialect):
# each must parse and run on Spark SQL unchanged.
ANSI_PORTABLE = [
    "q1_pricing_summary",
    "j_big_spender_semi",
    "j_customers_without_orders",
    "g_rollup_orders",
    "t_top3_orders_per_customer",
    "w_event_transitions",
    "t_global_dense_ids",
]


def _norm(df):
    cols = sorted(df.columns)
    out = []
    for row in df.collect():
        vals = []
        for c in cols:
            v = row[c]
            vals.append(f"{v:.10g}" if isinstance(v, float) else str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", ANSI_PORTABLE)
def test_sql_frontend_matches_dataframe_plan(spark, sf_dir, name):
    register_views(spark, sf_dir)
    via_sql = spark.sql(oracle_sql_map()[name])
    via_df = query_map()[name](spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert _norm(via_sql) == _norm(via_df)
