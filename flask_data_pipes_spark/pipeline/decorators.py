"""Stage + processor decorator surface (reference:
flask_data_pipes/data_pipes/decorators.py — the public "operator" API).

Same 16 names, same tagging model (reference decorators.py:358-388):
decorating attaches `__task__` / `__async__` / `__many__` (+ load's
`record`/`batches`) to the function; PipelineMeta's MRO scan collects
them. Semantics in the Spark engine:

- core stages (`upload/extract/transform/load`): user code operates on
  DataFrames. `extract(spark, meta) -> DataFrame`,
  `transform(df) -> DataFrame`, `load(df, meta) -> None`.
  `many=True` hands the whole batch list `[(df, meta), ...]` to user
  code (reference decorators.py:127-138) — the `mapInPandas`-shaped
  escape hatch.
- sync `pre_*`: rewrite the meta list before the stage
  (reference: "append another file's meta" → a union, not a join).
- sync `post_extract`/`post_transform`: `DataFrame -> DataFrame`
  row hooks; dropping records = returning a filtered frame (the
  reference's return-None-to-drop, vectorized).
- async `pre_*` and `on_*_commit`: fire-and-forget driver callbacks —
  they cannot modify the stream (reference decorators.py:69-70), so
  they run on a thread pool; async-before-sync ordering preserved.
- `load(record=False)` skips marking objects loaded
  (decorators.py:273,294); `batches=N` maps to sink batch size
  (JDBC batchsize / per-partition commit interval).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

UPLOAD, EXTRACT, TRANSFORM, LOAD = "upload", "extract", "transform", "load"

PRE_UPLOAD = "pre_upload"
PRE_EXTRACT = "pre_extract"
POST_EXTRACT = "post_extract"
PRE_TRANSFORM = "pre_transform"
POST_TRANSFORM = "post_transform"
PRE_LOAD = "pre_load"
ON_UPLOAD_COMMIT = "on_upload_commit"
ON_EXTRACT_COMMIT = "on_extract_commit"
ON_TRANSFORM_COMMIT = "on_transform_commit"
ON_LOAD_COMMIT = "on_load_commit"

SYNC_TAGS = [PRE_UPLOAD, PRE_EXTRACT, POST_EXTRACT, PRE_TRANSFORM, POST_TRANSFORM, PRE_LOAD]
ASYNC_TAGS = [
    PRE_UPLOAD,
    PRE_EXTRACT,
    PRE_TRANSFORM,
    PRE_LOAD,
    ON_UPLOAD_COMMIT,
    ON_EXTRACT_COMMIT,
    ON_TRANSFORM_COMMIT,
    ON_LOAD_COMMIT,
]

__all__ = [
    "pre_upload",
    "upload",
    "pre_extract",
    "extract",
    "post_extract",
    "pre_transform",
    "transform",
    "post_transform",
    "pre_load",
    "load",
    "on_upload_commit",
    "on_extract_commit",
    "on_transform_commit",
    "on_load_commit",
    "tag_processor",
]


def tag_processor(tag_name: str, func: Optional[Callable], asynchronous: bool, **kwargs: Any):
    """Tag `func` for discovery (reference decorators.py:358-388)."""
    if func is None:
        return functools.partial(tag_processor, tag_name, asynchronous=asynchronous, **kwargs)
    func.__task__ = tag_name
    func.__async__ = asynchronous
    func.__many__ = kwargs.pop("many", False)
    func.__task_kwargs__ = kwargs
    return func


def pre_upload(func=None, asynchronous: bool = False):
    return tag_processor(PRE_UPLOAD, func, asynchronous)


def upload(func=None, **kwargs):
    return tag_processor(UPLOAD, func, asynchronous=False, many=False, **kwargs)


def pre_extract(func=None, asynchronous: bool = False):
    return tag_processor(PRE_EXTRACT, func, asynchronous)


def extract(func=None, many: bool = False, **kwargs):
    return tag_processor(EXTRACT, func, asynchronous=False, many=many, **kwargs)


def post_extract(func=None):
    return tag_processor(POST_EXTRACT, func, asynchronous=False)


def pre_transform(func=None, asynchronous: bool = False):
    return tag_processor(PRE_TRANSFORM, func, asynchronous)


def transform(func=None, many: bool = False, **kwargs):
    return tag_processor(TRANSFORM, func, asynchronous=False, many=many, **kwargs)


def post_transform(func=None):
    return tag_processor(POST_TRANSFORM, func, asynchronous=False)


def pre_load(func=None, asynchronous: bool = False):
    return tag_processor(PRE_LOAD, func, asynchronous)


def load(func=None, many: bool = False, record: bool = True, batches: Optional[int] = None, **kwargs):
    return tag_processor(
        LOAD, func, asynchronous=False, many=many, record=record, batches=batches, **kwargs
    )


def on_upload_commit(func=None):
    return tag_processor(ON_UPLOAD_COMMIT, func, asynchronous=True)


def on_extract_commit(func=None):
    return tag_processor(ON_EXTRACT_COMMIT, func, asynchronous=True)


def on_transform_commit(func=None):
    return tag_processor(ON_TRANSFORM_COMMIT, func, asynchronous=True)


def on_load_commit(func=None):
    return tag_processor(ON_LOAD_COMMIT, func, asynchronous=True)
