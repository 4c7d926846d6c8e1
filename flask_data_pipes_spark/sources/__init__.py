from .files import (  # noqa: F401
    read_csv,
    read_jdbc,
    read_jsonl,
    read_orc,
    read_parquet,
    read_staged,
    read_text,
)
