from .catalog import REGISTRY, QuerySpec, queries, oracle_sql, register  # noqa: F401
