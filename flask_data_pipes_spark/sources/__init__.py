from .files import read_csv, read_jdbc, read_jsonl, read_parquet, read_staged  # noqa: F401
