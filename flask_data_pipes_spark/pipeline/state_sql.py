"""Transactional DB-backed metadata store — the cluster-grade swap-in
for the driver-side JSONL `MetadataStore` (same interface, same
semantics; reference tables: `__etl_data_models` / `__etl_data_objects`,
flask_data_pipes/data_pipes/tables.py:10-38, 90-157).

Why it exists: the JSONL store is exactly-once only within ONE driver
process (atomic file replace + an in-process lock). On a deployment
where several drivers/streaming jobs share pipeline state, the metadata
upsert must be a real transaction. `DbMetadataStore` talks to any DBAPI
connection (sqlite3 in tests; Postgres/MySQL via their DBAPI drivers in
production — the same `upsert_sql` dialects as `write_upsert`).

Metadata volume is one row per batch and per model-version — tiny — so
every operation is a single short transaction on a connection from
`connection_factory`; no pooling is needed at this rate, and the
hot-path ordering contract (data durable BEFORE metadata row, reference
pipeline.py:825-851) is unchanged because callers invoke `upsert` only
after their write returns.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from .state import PipelineVersionError, _done_key, _utcnow  # noqa: F401
from .versioning import TASK_KEYS, version_setter

__all__ = ["DbMetadataStore"]

_MODEL_COLS = (
    ["name", "pipeline", "pipeline_version", "pipeline_version_mapping",
     "directory", "filename"]
    + [f"has_{s}" for s in TASK_KEYS]
    + [f"{s}_sha256" for s in TASK_KEYS]
    + ["upload_accept", "upload_role", "upload_active", "created", "modified"]
)

_OBJECT_COLS = (
    ["pkey", "created", "model", "pipeline_version",
     "uploaded", "extracted", "transformed", "loaded"]
    + [f"{s}_date" for s in TASK_KEYS]
    + [f"{s}_file" for s in TASK_KEYS if s != "load"]
    + ["upload_user", "upload_meta", "pipeline_completed", "batch_id"]
)

_BOOL_COLS = {
    "uploaded", "extracted", "transformed", "loaded", "pipeline_completed",
    "upload_active",
} | {f"has_{s}" for s in TASK_KEYS}


class DbMetadataStore:
    """`MetadataStore`-compatible store over a DBAPI connection factory.

    `connection_factory()` must return a DBAPI connection supporting
    `?` parameter style (sqlite3) or set `paramstyle='%s'` for
    psycopg-style drivers.
    """

    def __init__(
        self,
        connection_factory: Callable[[], Any],
        paramstyle: str = "?",
    ) -> None:
        self._connect = connection_factory
        self._ph = paramstyle
        self._init_schema()

    # -- plumbing ---------------------------------------------------------
    def _init_schema(self) -> None:
        conn = self._connect()
        try:
            cur = conn.cursor()
            cur.execute(
                """CREATE TABLE IF NOT EXISTS __etl_data_models (
                     name TEXT NOT NULL,
                     pipeline TEXT,
                     pipeline_version INTEGER NOT NULL,
                     pipeline_version_mapping TEXT,
                     directory TEXT, filename TEXT,
                     has_upload INTEGER, has_extract INTEGER,
                     has_transform INTEGER, has_load INTEGER,
                     upload_sha256 TEXT, extract_sha256 TEXT,
                     transform_sha256 TEXT, load_sha256 TEXT,
                     upload_accept TEXT, upload_role TEXT,
                     upload_active INTEGER,
                     created TEXT, modified TEXT,
                     PRIMARY KEY (name, pipeline_version)
                   )"""
            )
            cur.execute(
                """CREATE TABLE IF NOT EXISTS __etl_data_objects (
                     pkey INTEGER PRIMARY KEY,
                     created TEXT, model TEXT, pipeline_version INTEGER,
                     uploaded INTEGER DEFAULT 0, extracted INTEGER DEFAULT 0,
                     transformed INTEGER DEFAULT 0, loaded INTEGER DEFAULT 0,
                     upload_date TEXT, extract_date TEXT,
                     transform_date TEXT, load_date TEXT,
                     upload_file TEXT, extract_file TEXT, transform_file TEXT,
                     upload_user TEXT, upload_meta TEXT,
                     pipeline_completed INTEGER DEFAULT 0,
                     batch_id INTEGER
                   )"""
            )
            conn.commit()
        finally:
            conn.close()

    def _row_to_dict(self, cols: list[str], row) -> dict:
        d = dict(zip(cols, row))
        for c in _BOOL_COLS:
            if c in d and d[c] is not None:
                d[c] = bool(d[c])
        for jc in ("upload_meta", "pipeline_version_mapping", "upload_accept"):
            if isinstance(d.get(jc), str):
                try:
                    d[jc] = json.loads(d[jc])
                except (TypeError, ValueError):
                    pass
        return d

    def _q(self, sql: str) -> str:
        return sql.replace("?", self._ph) if self._ph != "?" else sql

    # -- __etl_data_models ------------------------------------------------
    def register_model(
        self, name: str, pipeline: str, directory: str, filename: str,
        config: dict[str, Any],
    ) -> dict:
        """version_setter semantics identical to MetadataStore
        (tables.py:40-84): new row per (name, version); version bumps
        only when a previously-set stage hash changed."""
        conn = self._connect()
        try:
            prev = self._latest_model(conn, name)
            hashes = {k: config.get(k) for k in [f"{s}_sha256" for s in TASK_KEYS]}
            version, mapping = version_setter(
                hashes,
                prev["pipeline_version"] if prev else None,
                prev["pipeline_version_mapping"] if prev else None,
                {k: prev.get(k) for k in hashes} if prev else None,
            )
            row = dict(
                name=name, pipeline=pipeline, pipeline_version=version,
                pipeline_version_mapping=json.dumps(mapping),
                directory=directory, filename=filename,
                **{f"has_{s}": bool(config.get(f"has_{s}")) for s in TASK_KEYS},
                **hashes,
                upload_accept=(
                    json.dumps(config.get("upload_accept"))
                    if config.get("upload_accept") is not None else None
                ),
                upload_role=(
                    str(config.get("upload_role"))
                    if config.get("upload_role") is not None else None
                ),
                upload_active=config.get("upload_active", True),
                created=_utcnow(), modified=_utcnow(),
            )
            cur = conn.cursor()
            cur.execute(
                self._q(
                    "DELETE FROM __etl_data_models WHERE name = ? AND pipeline_version = ?"
                ),
                (name, version),
            )
            cols = list(row)
            cur.execute(
                self._q(
                    f"INSERT INTO __etl_data_models ({', '.join(cols)}) "
                    f"VALUES ({', '.join(['?'] * len(cols))})"
                ),
                tuple(int(v) if isinstance(v, bool) else v for v in row.values()),
            )
            conn.commit()
            return dict(row, pipeline_version_mapping=mapping)
        finally:
            conn.close()

    def _latest_model(self, conn, name: str) -> Optional[dict]:
        cur = conn.cursor()
        cur.execute(
            self._q(
                f"SELECT {', '.join(_MODEL_COLS)} FROM __etl_data_models "
                "WHERE name = ? ORDER BY pipeline_version DESC"
            ),
            (name,),
        )
        row = cur.fetchone()
        return self._row_to_dict(_MODEL_COLS, row) if row else None

    def latest_model(self, name: str) -> Optional[dict]:
        conn = self._connect()
        try:
            return self._latest_model(conn, name)
        finally:
            conn.close()

    def get_model(self, name: str, version: int) -> Optional[dict]:
        conn = self._connect()
        try:
            cur = conn.cursor()
            cur.execute(
                self._q(
                    f"SELECT {', '.join(_MODEL_COLS)} FROM __etl_data_models "
                    "WHERE name = ? AND pipeline_version = ?"
                ),
                (name, version),
            )
            row = cur.fetchone()
            return self._row_to_dict(_MODEL_COLS, row) if row else None
        finally:
            conn.close()

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
        """Insert-or-stage-update, one transaction. Same contract as
        MetadataStore.upsert incl. (model, batch_id) idempotency for
        foreachBatch replays."""
        conn = self._connect()
        try:
            cur = conn.cursor()
            entry = None
            if pkey is not None:
                entry = self._get_object(conn, pkey)
                if entry is None:
                    raise KeyError(f"no DataObject pkey={pkey}")
            elif batch_id is not None and model:
                cur.execute(
                    self._q(
                        f"SELECT {', '.join(_OBJECT_COLS)} FROM __etl_data_objects "
                        "WHERE batch_id = ? AND model = ?"
                    ),
                    (batch_id, model),
                )
                row = cur.fetchone()
                if row is not None:
                    entry = self._row_to_dict(_OBJECT_COLS, row)
            if entry is None:
                if not (created and model):
                    raise TypeError(
                        "upsert() missing required keyword argument: supply "
                        "either 'pkey' or 'created' and 'model'"
                    )
                latest = self._latest_model(conn, model)
                cur.execute(
                    self._q(
                        "INSERT INTO __etl_data_objects "
                        "(created, model, pipeline_version, batch_id) "
                        "VALUES (?, ?, ?, ?)"
                    ),
                    (
                        created, model,
                        latest["pipeline_version"] if latest else None,
                        batch_id,
                    ),
                )
                entry = self._get_object(conn, cur.lastrowid)
            sets = [f"{_done_key(stage)} = 1", f"{stage}_date = ?"]
            params: list[Any] = [_utcnow()]
            if stage != "load":
                sets.append(f"{stage}_file = ?")
                params.append(file)
            if stage == "upload":
                sets += ["upload_user = ?", "upload_meta = ?"]
                params += [
                    str(user) if user is not None else None,
                    json.dumps(meta) if meta is not None else None,
                ]
            params.append(entry["pkey"])
            cur.execute(
                self._q(
                    f"UPDATE __etl_data_objects SET {', '.join(sets)} WHERE pkey = ?"
                ),
                tuple(params),
            )
            # recompute pipeline_completed against the model's stages
            entry = self._get_object(conn, entry["pkey"])
            model_row = None
            if entry["model"] is not None and entry["pipeline_version"] is not None:
                cur.execute(
                    self._q(
                        f"SELECT {', '.join(_MODEL_COLS)} FROM __etl_data_models "
                        "WHERE name = ? AND pipeline_version = ?"
                    ),
                    (entry["model"], entry["pipeline_version"]),
                )
                r = cur.fetchone()
                model_row = self._row_to_dict(_MODEL_COLS, r) if r else None
            implemented = [
                k for k in TASK_KEYS if model_row and model_row.get(f"has_{k}")
            ]
            if implemented and all(entry[_done_key(k)] for k in implemented):
                cur.execute(
                    self._q(
                        "UPDATE __etl_data_objects SET pipeline_completed = 1 "
                        "WHERE pkey = ?"
                    ),
                    (entry["pkey"],),
                )
            conn.commit()
            return dict(
                pkey=entry["pkey"], model=entry["model"], file=file,
                created=entry["created"],
            )
        finally:
            conn.close()

    def _get_object(self, conn, pkey: int) -> Optional[dict]:
        cur = conn.cursor()
        cur.execute(
            self._q(
                f"SELECT {', '.join(_OBJECT_COLS)} FROM __etl_data_objects "
                "WHERE pkey = ?"
            ),
            (pkey,),
        )
        row = cur.fetchone()
        return self._row_to_dict(_OBJECT_COLS, row) if row else None

    def get_object(self, pkey: int) -> Optional[dict]:
        conn = self._connect()
        try:
            return self._get_object(conn, pkey)
        finally:
            conn.close()

    @property
    def objects(self) -> list[dict]:
        conn = self._connect()
        try:
            cur = conn.cursor()
            cur.execute(
                f"SELECT {', '.join(_OBJECT_COLS)} FROM __etl_data_objects "
                "ORDER BY pkey"
            )
            return [self._row_to_dict(_OBJECT_COLS, r) for r in cur.fetchall()]
        finally:
            conn.close()

    @property
    def models(self) -> list[dict]:
        conn = self._connect()
        try:
            cur = conn.cursor()
            cur.execute(
                f"SELECT {', '.join(_MODEL_COLS)} FROM __etl_data_models "
                "ORDER BY name, pipeline_version"
            )
            return [self._row_to_dict(_MODEL_COLS, r) for r in cur.fetchall()]
        finally:
            conn.close()

    # -- resume logic (identical algorithm to MetadataStore) --------------
    def next(self, pkey: int) -> tuple[Optional[str], Optional[dict]]:
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
            pkey=obj["pkey"], model=obj["model"],
            file=obj.get(f"{TASK_KEYS[idx - 1]}_file"), created=obj["created"],
        )
        model = self.get_model(obj["model"], obj["pipeline_version"])
        if model and model.get(f"has_{stage}"):
            return stage, meta
        return None, None

    def incomplete_objects(self) -> list[dict]:
        out = []
        for o in self.objects:
            stage, _meta = self.next(o["pkey"])
            if stage is not None:
                out.append(o)
        return out

    # -- Spark views ------------------------------------------------------
    def to_df(self, spark, table: str = "objects"):
        """Explicit schema (all-null columns are common on fresh rows and
        would otherwise fail Spark's type inference)."""
        rows = self.objects if table == "objects" else self.models
        if table == "objects":
            cols, longs = _OBJECT_COLS, {"pkey", "pipeline_version", "batch_id"}
        else:
            cols, longs = _MODEL_COLS, {"pipeline_version"}
        ddl = ", ".join(
            f"`{c}` "
            + (
                "long"
                if c in longs
                else "boolean" if c in _BOOL_COLS else "string"
            )
            for c in cols
        )
        data = [
            tuple(
                json.dumps(r.get(c))
                if isinstance(r.get(c), (dict, list))
                else r.get(c)
                for c in cols
            )
            for r in rows
        ]
        return spark.createDataFrame(data, ddl)
