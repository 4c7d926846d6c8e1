from .writers import (  # noqa: F401
    compact_parquet,
    dated_path,
    upsert_sql,
    write_bucketed,
    write_jdbc,
    write_jsonl,
    write_orc,
    write_parquet,
    write_sorted_parquet,
    write_upsert,
)
