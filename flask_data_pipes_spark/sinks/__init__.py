from .writers import dated_path, write_jdbc, write_jsonl, write_parquet  # noqa: F401
