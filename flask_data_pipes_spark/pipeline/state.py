"""Per-object execution state + model version records (reference:
flask_data_pipes/data_pipes/tables.py — `__etl_data_models` /
`__etl_data_objects`).

The store is a driver-side metadata table persisted as JSONL with
atomic replace (temp + os.replace), queryable as a Spark DataFrame via
`to_df`. Metadata volume is one row per batch/model-version — tiny by
construction — so a driver-side exactly-once upsert is the correct
scale design; on a multi-driver deployment the same interface backs
onto a transactional table (Delta/JDBC MERGE) without changing callers.

State machine parity (tables.py:90-237):
- DataObject rows: booleans uploaded/extracted/transformed/loaded,
  per-stage timestamps + file paths.
- `upsert(stage, file, pkey | created+model)`: update-or-insert,
  returns the meta dict `{pkey, model, file, created}` (tables.py:141-157).
- `next()`: first un-done stage after the first done one, validated
  against the model version's has_<stage>; fully-processed → (None,
  None) (tables.py:133-137, 159-182).
- `advance()` re-enters the pipeline chain at `next()`'s stage with a
  version-match assertion (tables.py:184-196).
"""

from __future__ import annotations

import json
import os
import threading
from datetime import datetime, timezone
from typing import Any, Optional

from .versioning import TASK_KEYS, version_setter


# Canonical definition lives in the package-level taxonomy
# (exceptions.py, reference exceptions.py:36-39); re-exported here for
# back-compat with earlier imports.
from ..exceptions import PipelineVersionError  # noqa: F401,E402


def _utcnow() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")


class MetadataStore:
    """JSONL-backed store for the two metadata tables."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._lock = threading.RLock()
        os.makedirs(root, exist_ok=True)
        self._models_path = os.path.join(root, "data_models.jsonl")
        self._objects_path = os.path.join(root, "data_objects.jsonl")
        self.models: list[dict] = self._read(self._models_path)
        self.objects: list[dict] = self._read(self._objects_path)

    # -- persistence ------------------------------------------------------
    def _read(self, path: str) -> list[dict]:
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def _flush(self, path: str, rows: list[dict]) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r, default=str) + "\n")
        os.replace(tmp, path)  # atomic on POSIX

    # -- __etl_data_models ------------------------------------------------
    def register_model(
        self,
        name: str,
        pipeline: str,
        directory: str,
        filename: str,
        config: dict[str, Any],
    ) -> dict:
        """Insert a DataModel row with version_setter semantics
        (tables.py:40-84): a new row per (name, version); version bumps
        only when a previously-set stage hash changed."""
        with self._lock:
            prev = self.latest_model(name)
            hashes = {k: config.get(k) for k in [f"{s}_sha256" for s in TASK_KEYS]}
            version, mapping = version_setter(
                hashes,
                prev["pipeline_version"] if prev else None,
                prev["pipeline_version_mapping"] if prev else None,
                {k: prev.get(k) for k in hashes} if prev else None,
            )
            row = dict(
                name=name,
                pipeline=pipeline,
                pipeline_version=version,
                pipeline_version_mapping=mapping,
                directory=directory,
                filename=filename,
                **{f"has_{s}": bool(config.get(f"has_{s}")) for s in TASK_KEYS},
                **hashes,
                upload_accept=config.get("upload_accept"),
                upload_role=config.get("upload_role"),
                upload_active=config.get("upload_active", True),
                created=_utcnow(),
                modified=_utcnow(),
            )
            # replace same (name, version) entry, else append
            self.models = [
                m
                for m in self.models
                if not (m["name"] == name and m["pipeline_version"] == version)
            ] + [row]
            self._flush(self._models_path, self.models)
            return row

    def latest_model(self, name: str) -> Optional[dict]:
        rows = [m for m in self.models if m["name"] == name]
        return max(rows, key=lambda m: m["pipeline_version"]) if rows else None

    def get_model(self, name: str, version: int) -> Optional[dict]:
        for m in self.models:
            if m["name"] == name and m["pipeline_version"] == version:
                return m
        return None

    # -- __etl_data_objects -----------------------------------------------
    def upsert(
        self,
        stage: str,
        file: Optional[str],
        pkey: Optional[int] = None,
        created: Optional[str] = None,
        model: Optional[str] = None,
        user: Optional[Any] = None,
        meta: Optional[dict] = None,
        batch_id: Optional[int] = None,
    ) -> dict:
        """Insert-or-stage-update (tables.py:139-157).

        `batch_id` makes the insert idempotent per (model, batch_id):
        a foreachBatch replay of the same micro-batch updates its
        existing DataObject row instead of inserting a duplicate —
        Spark's exactly-once contract for foreachBatch sinks."""
        with self._lock:
            if pkey is not None:
                entry = self.get_object(pkey)
                if entry is None:
                    raise KeyError(f"no DataObject pkey={pkey}")
            elif batch_id is not None and model and any(
                o.get("batch_id") == batch_id and o["model"] == model
                for o in self.objects
            ):
                entry = next(
                    o
                    for o in self.objects
                    if o.get("batch_id") == batch_id and o["model"] == model
                )
            elif created and model:
                latest = self.latest_model(model)
                entry = dict(
                    pkey=(max((o["pkey"] for o in self.objects), default=0) + 1),
                    created=created,
                    model=model,
                    pipeline_version=latest["pipeline_version"] if latest else None,
                    uploaded=False,
                    extracted=False,
                    transformed=False,
                    loaded=False,
                    upload_date=None,
                    extract_date=None,
                    transform_date=None,
                    load_date=None,
                    upload_file=None,
                    extract_file=None,
                    transform_file=None,
                    upload_user=None,
                    upload_meta=None,
                    pipeline_completed=False,
                    batch_id=batch_id,
                )
                self.objects.append(entry)
            else:
                raise TypeError(
                    "upsert() missing required keyword argument: supply either "
                    "'pkey' or 'created' and 'model'"
                )
            entry[_done_key(stage)] = True
            entry[f"{stage}_date"] = _utcnow()
            if stage != "load":
                entry[f"{stage}_file"] = file
            if stage == "upload":
                entry["upload_user"] = user
                entry["upload_meta"] = meta
            implemented = [k for k in TASK_KEYS if self._implemented(entry, k)]
            if implemented and all(entry[_done_key(k)] for k in implemented):
                entry["pipeline_completed"] = True
            self._flush(self._objects_path, self.objects)
            return dict(
                pkey=entry["pkey"],
                model=entry["model"],
                file=file,
                created=entry["created"],
            )

    def _implemented(self, entry: dict, stage: str) -> bool:
        model = self.get_model(entry["model"], entry["pipeline_version"])
        return bool(model and model.get(f"has_{stage}"))

    def get_object(self, pkey: int) -> Optional[dict]:
        for o in self.objects:
            if o["pkey"] == pkey:
                return o
        return None

    def next(self, pkey: int) -> tuple[Optional[str], Optional[dict]]:
        """First incomplete stage for the object, validated against the
        model version's implemented stages (tables.py:159-182)."""
        obj = self.get_object(pkey)
        if obj is None:
            raise TypeError("next() requires a known pkey")
        flags = [obj[_done_key(k)] for k in TASK_KEYS]
        try:
            start = flags.index(True)
        except ValueError:
            return None, None
        try:
            idx = flags[start:].index(False) + start
        except ValueError:
            return None, None
        stage = TASK_KEYS[idx]
        meta = dict(
            pkey=obj["pkey"],
            model=obj["model"],
            file=obj.get(f"{TASK_KEYS[idx - 1]}_file"),
            created=obj["created"],
        )
        model = self.get_model(obj["model"], obj["pipeline_version"])
        if model and model.get(f"has_{stage}"):
            return stage, meta
        return None, None

    def incomplete_objects(self) -> list[dict]:
        """Objects with a remaining implemented stage (the restart-
        stalled-pipelines scan, reference tasks.py:22-30)."""
        out = []
        for o in self.objects:
            stage, _meta = self.next(o["pkey"])
            if stage is not None:
                out.append(o)
        return out

    # -- Spark views ------------------------------------------------------
    def to_df(self, spark, table: str = "objects"):
        rows = self.objects if table == "objects" else self.models
        import pandas as pd

        if not rows:
            return spark.createDataFrame(pd.DataFrame({"pkey": []}))
        return spark.createDataFrame(pd.DataFrame(rows).astype(object).where(pd.notnull(pd.DataFrame(rows)), None))


def _done_key(stage: str) -> str:
    return {
        "upload": "uploaded",
        "extract": "extracted",
        "transform": "transformed",
        "load": "loaded",
    }[stage]
