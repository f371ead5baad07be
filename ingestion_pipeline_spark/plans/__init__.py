from .registry import REGISTRY, QuerySpec, oracle_sql_map, query_map  # noqa: F401
