"""The two halves of the repo COMPOSED (round 12, VERDICT r11 #4): an
LLM pretraining pipeline — clean → exact-dedup → tokenize-to-real-ids
→ GPT-style pack — run THROUGH the reference orchestration spine:
`Pipeline` stages with per-object state rows (O3, reference
tables.py:133-196), source-hash versioning (O5), and a mid-pipeline
crash → `advance()` resume (O4, reference pipeline.py:456-485). The
resume law: a run that crashes inside the transform stage and is then
advance()d produces BYTE-IDENTICAL final output to an uninterrupted
run of the same pipeline on the same input.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.models import Model, fields
from flask_data_pipes_spark.pipeline import Pipeline, decorators
from flask_data_pipes_spark.session import EngineConfig

EOS = "<|eot|>"
VOCAB = [(c, -3.0, 1) for c in "abcdefghijklmnopqrstuvwxyz0123456789"]

DOCS = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 2, "text": "pack my box with five dozen liquor jugs"},
    {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog"},
    {"doc_id": 4, "text": "sphinx of black quartz judge my vow"},
    {"doc_id": 5, "text": "x"},
    {"doc_id": 6, "text": "how vexingly quick daft zebras jump"},
]


def _llm_transform_body(df):
    """clean → exact dedup → encode to ids (+EOS) → pack: every stage
    an already-gate-checked operator, chained as ONE transform core."""
    from flask_data_pipes_spark.operators.corpus import pack_sequence_ids
    from flask_data_pipes_spark.operators.dedup import exact_dedup
    from flask_data_pipes_spark.operators.unigram import unigram_encode_ids

    clean = df.where(F.length(F.trim("text")) >= 2)
    kept = clean.join(
        exact_dedup(clean).select(F.col("keep_doc_id").alias("doc_id")),
        "doc_id",
    )
    enc = unigram_encode_ids(
        kept,
        VOCAB,
        max_piece_len=1,
        byte_fallback=True,
        special_tokens=(EOS,),
        append_eos=EOS,
    )
    return pack_sequence_ids(enc, seq_len=16, n_groups=2, pad_id=0)


def _build(tmp_path, spark, name, crash_once):
    """A fresh Pipeline subclass + Model per store dir (the registry
    metaclass keys on qualname, so each scenario gets its own name)."""
    crash_state = {"armed": crash_once}

    body = {
        "extract": True,
        "transform": True,
        "load": True,
        "crash_state": crash_state,
    }

    def llm_transform(self, df, meta):
        return _llm_transform_body(df)

    def maybe_crash(self, df, meta):
        # post_transform runs BEFORE _commit_stage: an injected crash
        # here leaves the object extracted-but-not-transformed, the
        # exact mid-pipeline state advance() exists to resume from
        if self.crash_state["armed"]:
            self.crash_state["armed"] = False
            raise RuntimeError("injected transform crash")
        return df

    body["llm_transform"] = decorators.transform(llm_transform)
    body["maybe_crash"] = decorators.post_transform(maybe_crash)
    pipe_cls = type(f"LlmSpine{name}", (Pipeline,), body)

    model_cls = type(
        f"PackedSeq{name}",
        (Model,),
        {
            "grp": fields.Integer(),
            "seq_idx": fields.Integer(),
            "ids": fields.List(),
            "n_tokens": fields.Integer(),
        },
    )
    cfg = EngineConfig(data_dir=str(tmp_path / f"data_{name}"))
    pipe = pipe_cls(model=model_cls, spark=spark, config=cfg)
    pipe.register_model(model_cls)
    raw = tmp_path / f"raw_{name}.jsonl"
    raw.write_text("\n".join(json.dumps(d) for d in DOCS))
    meta = [
        dict(
            pkey=None,
            model=model_cls.__qname__,
            file=str(raw),
            created="2026-08-15",
        )
    ]
    return pipe, model_cls, meta, cfg


def _final_rows(spark, cfg, model_cls):
    import os

    load_dir = os.path.join(cfg.data_dir, "load", model_cls.filename())
    return sorted(
        (r["grp"], r["seq_idx"], tuple(int(x) for x in r["ids"]), r["n_tokens"])
        for r in spark.read.parquet(load_dir).collect()
    )


def test_llm_pipeline_through_spine_resumes_identically(spark, tmp_path):
    # --- uninterrupted reference run ---------------------------------
    pipe_a, model_a, meta_a, cfg_a = _build(tmp_path, spark, "A", False)
    out = pipe_a(stage="extract", meta=meta_a)
    assert len(out) == 1
    obj = pipe_a.store.get_object(out[0]["pkey"])
    assert obj["extracted"] and obj["transformed"] and obj["loaded"]
    assert obj["pipeline_completed"]
    want = _final_rows(spark, cfg_a, model_a)
    # the packed output is real: fixed-shape pad-mode sequences, one
    # EOS per surviving doc (6 input - 1 dup - 1 too-short = 4)
    assert all(len(r[2]) == 16 for r in want)
    eos_id = 0  # piece_id_table: specials first
    assert sum(r[2].count(eos_id) - (16 - r[3]) for r in want) == 4

    # --- crashing run: stage 2 dies before its commit -----------------
    pipe_b, model_b, meta_b, cfg_b = _build(tmp_path, spark, "B", True)
    with pytest.raises(RuntimeError, match="injected transform crash"):
        pipe_b(stage="extract", meta=meta_b)
    pkey = pipe_b.store.objects[-1]["pkey"]
    obj = pipe_b.store.get_object(pkey)
    # O3 state row: extract committed + staged, transform did NOT
    assert obj["extracted"] and not obj["transformed"]
    assert obj["extract_file"] and "/2026/08/15/" in obj["extract_file"]
    stage, m = pipe_b.store.next(pkey)
    assert stage == "transform"
    # O5: the object carries the registered pipeline version and
    # advance() verifies it against the latest DataModel row
    latest = pipe_b.store.latest_model(model_b.__qname__)
    assert obj["pipeline_version"] == latest["pipeline_version"]

    # --- O4: advance() resumes at transform, finishes the chain ------
    pipe_b.advance(pkey)
    obj = pipe_b.store.get_object(pkey)
    assert obj["transformed"] and obj["loaded"] and obj["pipeline_completed"]
    assert pipe_b.store.next(pkey) == (None, None)

    # --- the resume law ----------------------------------------------
    got = _final_rows(spark, cfg_b, model_b)
    assert got == want

    # advancing a completed object refuses (reference pipeline.py:477)
    from flask_data_pipes_spark.pipeline.pipeline import StopPipeline

    with pytest.raises(StopPipeline):
        pipe_b.advance(pkey)
