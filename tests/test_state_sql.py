"""DbMetadataStore: the transactional (DBAPI) twin of the JSONL
MetadataStore — same interface, same state-machine semantics, proven on
sqlite3 (production: Postgres/MySQL DBAPI drivers).

Covers: schema bootstrap, golden end-to-end pipeline with store swapped
in, resume via next/advance, version_setter bump behavior across
re-registrations, and (model, batch_id) idempotency for foreachBatch
replays.
"""

from __future__ import annotations

import json
import sqlite3

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.models import Model, fields
from flask_data_pipes_spark.pipeline import DbMetadataStore, Pipeline, decorators
from flask_data_pipes_spark.session import EngineConfig


def _store(tmp_path):
    db = str(tmp_path / "meta.db")
    return DbMetadataStore(lambda: sqlite3.connect(db)), db


def test_object_state_machine_and_next(tmp_path):
    store, _ = _store(tmp_path)
    store.register_model(
        "m.Doc", "P", "docs", "doc",
        {"has_extract": True, "has_transform": True, "has_load": True},
    )
    meta = store.upsert("extract", "/f/e.jsonl", created="2026-08-13", model="m.Doc")
    pkey = meta["pkey"]
    assert store.next(pkey) == (
        "transform",
        {"pkey": pkey, "model": "m.Doc", "file": "/f/e.jsonl", "created": "2026-08-13"},
    )
    store.upsert("transform", "/f/t.jsonl", pkey=pkey)
    stage, m = store.next(pkey)
    assert stage == "load" and m["file"] == "/f/t.jsonl"
    obj = store.get_object(pkey)
    assert obj["extracted"] and obj["transformed"] and not obj["loaded"]
    assert not obj["pipeline_completed"]
    store.upsert("load", None, pkey=pkey)
    obj = store.get_object(pkey)
    assert obj["loaded"] and obj["pipeline_completed"]
    assert store.next(pkey) == (None, None)
    assert store.incomplete_objects() == []


def test_version_bump_semantics(tmp_path):
    store, _ = _store(tmp_path)
    cfg1 = {
        "has_extract": True, "has_transform": True,
        "extract_sha256": "aaa", "transform_sha256": "bbb",
    }
    r1 = store.register_model("m.Doc", "P", "docs", "doc", cfg1)
    # identical hashes → same version
    r2 = store.register_model("m.Doc", "P", "docs", "doc", cfg1)
    assert r2["pipeline_version"] == r1["pipeline_version"]
    # changed previously-set hash → bump
    r3 = store.register_model(
        "m.Doc", "P", "docs", "doc", dict(cfg1, transform_sha256="ccc")
    )
    assert r3["pipeline_version"] == r1["pipeline_version"] + 1
    assert store.latest_model("m.Doc")["pipeline_version"] == r3["pipeline_version"]
    # both versions retrievable
    assert store.get_model("m.Doc", r1["pipeline_version"])["transform_sha256"] == "bbb"


def test_batch_id_idempotency(tmp_path):
    store, db = _store(tmp_path)
    store.register_model("m.Doc", "P", "docs", "doc", {"has_transform": True})
    a = store.upsert(
        "transform", "/f/b0.jsonl", created="2026-08-13", model="m.Doc", batch_id=0
    )
    b = store.upsert(
        "transform", "/f/b1.jsonl", created="2026-08-13", model="m.Doc", batch_id=1
    )
    assert a["pkey"] != b["pkey"]
    # replay of batch 0 updates the SAME row
    a2 = store.upsert(
        "transform", "/f/b0-replay.jsonl", created="2026-08-13", model="m.Doc",
        batch_id=0,
    )
    assert a2["pkey"] == a["pkey"]
    assert len(store.objects) == 2
    with sqlite3.connect(db) as conn:
        rows = conn.execute(
            "SELECT batch_id, transform_file FROM __etl_data_objects ORDER BY pkey"
        ).fetchall()
    assert rows == [(0, "/f/b0-replay.jsonl"), (1, "/f/b1.jsonl")]


def test_upsert_validation(tmp_path):
    store, _ = _store(tmp_path)
    with pytest.raises(KeyError):
        store.upsert("extract", None, pkey=999)
    with pytest.raises(TypeError):
        store.upsert("extract", None)


def test_golden_pipeline_with_db_store(spark, tmp_path):
    """The full extract→transform→load spine runs unchanged with the
    transactional store swapped in (Pipeline takes store= injection)."""

    class DbUser(Model):
        first = fields.UppercaseString()
        last = fields.UppercaseString()

    class DbStorePipeline(Pipeline):
        extract = True
        transform = True
        load = True

        @decorators.post_transform
        def drop_blank(self, df, meta):
            return df.filter(F.col("first") != "")

    store, db = _store(tmp_path)
    cfg = EngineConfig(data_dir=str(tmp_path / "data"))
    pipe = DbStorePipeline(model=DbUser, spark=spark, config=cfg, store=store)
    pipe.register_model(DbUser)

    raw = tmp_path / "users.jsonl"
    raw.write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"first": "ada", "last": "lovelace"},
                {"first": "", "last": "nobody"},
            ]
        )
    )
    meta = [dict(pkey=None, model=DbUser.__qname__, file=str(raw), created="2026-08-13")]
    out = pipe(stage="extract", meta=meta)
    obj = pipe.store.get_object(out[0]["pkey"])
    assert obj["extracted"] and obj["transformed"] and obj["loaded"]
    assert obj["pipeline_completed"]

    # rows live in the real DB, visible to any other driver
    with sqlite3.connect(db) as conn:
        n_obj = conn.execute("SELECT COUNT(*) FROM __etl_data_objects").fetchone()[0]
        n_mod = conn.execute("SELECT COUNT(*) FROM __etl_data_models").fetchone()[0]
    assert n_obj == 1 and n_mod == 1

    # to_df exposes the same rows to Spark
    assert pipe.store.to_df(spark, "objects").count() == 1
