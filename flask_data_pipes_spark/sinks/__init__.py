from .writers import (  # noqa: F401
    dated_path,
    upsert_sql,
    write_jdbc,
    write_jsonl,
    write_orc,
    write_parquet,
    write_upsert,
)
