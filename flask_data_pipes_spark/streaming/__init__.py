from .stream import (  # noqa: F401
    EVENTS_SCHEMA,
    foreach_batch_stage,
    hourly_rollup,
    read_jsonl_stream,
    sessionize_batch,
    sessionize_stream,
)
