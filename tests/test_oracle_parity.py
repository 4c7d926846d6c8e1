"""Local twin of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and order-insensitive values.

Two comparisons per query:
1. strict value parity via collect()/fetchall (exact ints/strings/
   timestamps, bit-level doubles) with a diff sample on mismatch;
2. a driver-harness mimic: both results through pandas (toPandas /
   duckdb .df()), columns sorted by name, rows sorted by all columns,
   then dtype-sensitive hashing — this catches canonicalization
   artifacts the exact path can't see (DuckDB HUGEINT/DECIMAL→float64
   vs Spark int64/Decimal, unsortable array cells), which is exactly
   what failed 4 gate rows in round 1 despite identical values.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)) or hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _norm_rows(rows):
    return sorted((tuple(_norm_cell(v) for v in r) for r in rows), key=repr)


def _query_names():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize(
    "name", [n for n, _, o in _query_names() if o is not None]
)
def test_oracle_parity(spark, sf_dir, name):
    specs = {n: (fn, o) for n, fn, o in _query_names()}
    fn, oracle = specs[name]

    sdf = fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    duck = con.sql(oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )

    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [duck_cols.index(c) for c in order]
    s_rows = _norm_rows(([r[i] for i in s_idx] for r in spark_rows))
    d_rows = _norm_rows(([r[i] for i in d_idx] for r in duck_rows))

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ]
        raise AssertionError(
            f"{name}: {len(diffs)} mismatched rows of {len(s_rows)}; "
            f"first 3: {diffs[:3]}"
        )


def _canon_pd(df: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver harness's canonicalization: columns sorted by
    name, rows sorted by every column, index dropped."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # unify datetime resolution (Spark toPandas → ns, DuckDB → us);
        # the driver hash is resolution-insensitive (round-1 evidence:
        # every timestamp-valued query passed), so don't flag it here
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _pd_hash(df: pd.DataFrame):
    # dtype-sensitive, like the driver's value hash: int64 0 and
    # float64 0.0 must NOT collide.
    return pd.util.hash_pandas_object(df, index=False).sum()


@pytest.mark.parametrize(
    "name", [n for n, _, o in _query_names() if o is not None]
)
def test_gate_hash_mimic(spark, sf_dir, name):
    specs = {n: (fn, o) for n, fn, o in _query_names()}
    fn, oracle = specs[name]

    spark_pd = fn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    duck_pd = con.sql(oracle).df()

    a, b = _canon_pd(spark_pd), _canon_pd(duck_pd)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    # sort_values must not throw (unhashable/unsortable cells fail the
    # real gate with err != null)
    ha, hb = _pd_hash(a), _pd_hash(b)
    if ha != hb:
        bad = [
            c
            for c in a.columns
            if not pd.util.hash_pandas_object(a[c], index=False).equals(
                pd.util.hash_pandas_object(b[c], index=False)
            )
        ]
        raise AssertionError(
            f"{name}: harness-hash mismatch in columns {bad}; "
            f"dtypes spark={a[bad].dtypes.to_dict() if bad else {}} "
            f"duck={b[bad].dtypes.to_dict() if bad else {}}"
        )


# Queries whose oracle embeds the quality/stopword expression. The live
# documents testdata is all-lowercase, so the sweep above can never
# catch a case-sensitivity drift between Spark's stopword_ratio
# (lowercases before matching) and the SQL twins — this fixture can.
_QUALITY_SENSITIVE = [
    "llm_quality",
    "llm_weighted_sample",
    "llm_token_budget",
    "llm_corpus_clean",
    "llm_domain_stats",
]


@pytest.mark.parametrize("name", _QUALITY_SENSITIVE)
def test_quality_oracles_survive_capitalized_stopwords(
    spark, tmp_path, name
):
    """Regression (round-2 advice): a document containing 'The' must get
    the same quality score — and thus the same keep/drop decision — on
    both engines, even though live testdata never exercises case."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "The And Of To In Is That It For With",  # all-caps-initial stopwords
        "THE THE THE the the and AND other words here now",
        "MiXeD Case The End with some longer filler text to score",
        "no stopwords whatsoever xyzzy plugh quux",
        "the quick brown fox jumps over the lazy dog " * 12,
        "",
        "   ",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(
                [f"src{i % 2}" for i in range(len(texts))], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    specs = {n: (fn, o) for n, fn, o in _query_names()}
    fn, oracle = specs[name]

    sdf = fn(spark, str(tmp_path))
    spark_cols = sdf.columns
    spark_rows = sdf.collect()

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    duck = con.sql(oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [duck_cols.index(c) for c in order]
    s_rows = _norm_rows(([r[i] for i in s_idx] for r in spark_rows))
    d_rows = _norm_rows(([r[i] for i in d_idx] for r in duck_rows))
    assert s_rows == d_rows, (
        f"{name}: capitalized-stopword divergence; first diff: "
        f"{next(((a, b) for a, b in zip(s_rows, d_rows) if a != b), None)}"
    )


# --- golden pins for the non-SQL-expressible queries ------------------------
#
# The driver gate records only a rows-check for queries without an
# oracle_sql entry (kmeans / ML-LSH / Python-side media codecs). These
# pins close that gap (VERDICT r3 #2): every output is deterministic —
# synthetic payloads and stdlib codecs derive purely from doc_id, the
# ML MinHashLSH and kmeans seeds are fixed — so the full value set can
# be pinned as a sha256 over normalized sorted rows. Floats are
# rounded to 9 significant digits before hashing, which absorbs
# agg-order ulp wiggle (digests verified identical across local[8]/
# shuffle=8 and local[*]/shuffle=32).

GOLDEN_SF_DIR = "/root/testdata/sf0.001"

GOLDEN_DIGESTS = {
    # WARC/WET ingest round-trip (round 14): both compression layouts,
    # skip-and-count on the injected malformed record, byte-exact text
    # round-trip of all 48 fixture docs (n_match == n_docs == 24/side)
    "llm_warc_read": (
        2,
        "ef3aa301f3381c83bb0ee06a367c7c5782be9424cbd0d83de99300ebbbe59d0f",
    ),
    "llm_multimodal_decode": (
        500,
        "148c9a25daeb4c2c571c60492375d21deaa41fccb1202681f77e5b6a28613764",
    ),
    "llm_multimodal_features": (
        500,
        "ade8698e7b410d201b4b993f88ca08c05e16db226c1fa87ee96cdaa350c76692",
    ),
    "llm_multimodal_resize": (
        500,
        "a0c65acf7a1064ea33f544cd64efa57db6dfc4b3ff18a85353d236132180a412",
    ),
    "llm_multimodal_audio": (
        500,
        "1fd378ba3aee4b208b2cb57a2f99f062c5684b76f6b1d4ef82561f51a8c75fcd",
    ),
    # numpy-rfft signal features over the same WAV fixtures; the
    # period-4 square wave's centroid lands exactly on rate/4 (checked
    # in test_operators), so the pin guards real spectra, not noise
    "llm_audio_features": (
        500,
        "6bcfcae833862e6a1e44ae04d4bff9ee545d46f51c19fa8d56caa3a3e53dd79e",
    ),
    "llm_frame_sample": (
        2477,
        "4b26148f443707227771c460d4b8fc1e2adb40533edfcc615c486cb3ce183f32",
    ),
    # seeded kmeans (shared with ivf_fit) + xxhash64 within-cell order:
    # fully deterministic; 500 vectors / 8 cells at sf0.001, two cells
    # are singletons so the draw is 113 rows, not 160
    "llm_cluster_sample": (
        113,
        "ed33bedb99e9712b0f7fd52f0442afadaaab6d027b8c43ad3d08b4a9ed5feff8",
    ),
    "llm_ivf_topk": (
        40,
        "84364b598b1941733f50d747fa6cb54fffdee2aae3a4b54f2c16a9c272559c43",
    ),
    "llm_image_neardup": (
        1045,
        "19dc0b9a7fbb9e4568fd68baf8bcf8e4c791bd9ac843c10d973bae6b9c5a396b",
    ),
    # tokenizer inference: 24 trained merges applied back per-language;
    # deterministic (argmax tie-break + long counts + rounded ratio)
    "llm_bpe_encode": (
        5,
        "3791884525373bf6b8ecc4da7541da5e0418777f7c7419b1e19bd2689e4c15b6",
    ),
    # product quantization: seeded numpy codebooks + exact rerank
    "llm_pq_topk": (
        40,
        "6897241c1d80f26be64c84da73c3e46cddc69ee06b3cae91368ed809462499c5",
    ),
    # composed IVF-PQ: seeded ml-KMeans cells + residual codebooks
    "llm_ivfpq_topk": (
        40,
        "d9658d247ba60c50fe36537bdd215f3d0d8b4323e3723b04d701b3116d430f3b",
    ),
    # PQ reconstruction distortion gauge: 30-vector sample, 435 pairs
    "llm_pq_distortion": (
        435,
        "24a502015658032b756f8838a9c228fc50435531e1dd110c6fd1a5be5349bbbe",
    ),
    # round 10 — unigram-LM trainer (hard EM is deterministic: integer
    # expected counts, driver-side math.log, longest-piece Viterbi
    # tie-break) and its fertility rollup; digests verified identical
    # across local[8]/shuffle=8 and local[*]/shuffle=32 + tz
    # Australia/Eucla
    "llm_unigram_vocab": (
        55,
        "2a592a5786449479a7a26e91bc5b356d386e45943596ab8f7efa006564cc675d",
    ),
    "llm_unigram_encode": (
        5,
        "91f77e5a9a39cb3979b740095b6d464d4e7cb1f42b81a1ed4a04f0246db02c47",
    ),
    # round 11 — token-id materialization + GPT-style packing: trained
    # vocab → ids (specials→bytes→pieces) → fixed-512 sequences; the
    # pinned row carries the conservation invariant n_eos == n_docs;
    # digest verified identical across local[8]/8/UTC and local[*]/32
    # + tz Australia/Eucla
    "llm_pack_ids": (
        1,
        "e9708602b0586f1e95105b3db26001da93b141af8d3ca4c1c9515b5ec31e2010",
    ),
    # round 12 — training-shard export: manifest (counts, fixed-shape
    # bounds, bit_xor checksums) of the pad-mode packed corpus written
    # to disk and audited back; pins shard membership AND bytes-level
    # determinism of the whole encode→pack→export→verify round trip
    "llm_training_shards": (
        8,
        "e1a9b446ddefaf29611725098aee3aa9c99e6c55ebcc9380708b9eae135dfdb9",
    ),
    # round 11 — subword-regularization encode: per-(seed, word)-hash
    # seeded FFBS sampling is partitioning-independent by construction;
    # digest verified identical across local[8]/8/UTC and local[*]/32 +
    # tz Australia/Eucla
    "llm_unigram_sample_encode": (
        5,
        "add73fee69ea0416c63bec8421cbb01cde88d80b947af39695ca375e1ac374b4",
    ),
    # round 11 — the composed pretraining pipeline funnel: every stage
    # deterministic (hash splits, fixed perplexity cut, hard-EM LM,
    # min_by winners); digest verified identical across local[8]/8/UTC
    # and local[*]/32 + tz Australia/Eucla
    # (round-11 late: the tail upgraded from count-binning to REAL
    # token-id packing — unigram_encode_ids + pack_sequence_ids, with
    # per-doc EOS; pin regenerated, n_tokens = old count + n_docs eos)
    "llm_pipeline_e2e": (
        8,
        "76955cb5a7ed45c641bc27798d4b64434616d1746c3767ccaf94b5c6422eb51f",
    ),
    # KLL quantile sketch in deterministic mode (fixed hash routing +
    # within-partition sort + order-insensitive merge)
    "llm_kll_quantiles": (
        4,
        "ee5adbf38d8cf012d8c1b8cb1f2800dc47e11243277835cd3308ebbe8cb1a028",
    ),
    # LM-perplexity quality signal: per-word logliks rounded 6dp and
    # summed as DECIMAL(38,6) — agg-order independent by construction;
    # verified identical across local[8]/8 and local[*]/32 + tz
    "llm_unigram_perplexity": (
        5,
        "a44c5c4cf80aee2b8d674ef8dbced75f13afa8b27c82cb210a76401e156651d3",
    ),
    # hashed-LR learning curve: 8 full-batch GD iterations — logloss
    # strictly non-increasing (convex, full batch); the trajectory is
    # partitioning-independent by the 12-dp decimal-sum discipline
    # (final weights at 3 iters are ORACLED via llm_lr_train)
    "llm_lr_train_curve": (
        8,
        "16c20c77d9dcf73139b61f0589f0ae61646c2a47f4f8a783f03f5d6dc8d18e01",
    ),
    # whole-document BFD packing rollup: deterministic placement is a
    # pure function of each hash group's doc set (verified stable
    # across shuffle=32/7); ~2 whole docs per 512-id bin, padding
    # 3-15% per group — the economy the packer exists for
    "llm_pack_bins": (
        8,
        "2b397e2da8e1f2884282aa487c278530b22d4394052c1c2998e9e1806df0a7c4",
    ),
}


def _golden_digest(df):
    import hashlib

    def norm(v):
        if v is None:
            return "N"
        if isinstance(v, float):
            return "N" if math.isnan(v) else f"{v:.9g}"
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        if isinstance(v, list):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return repr(v)

    cols = sorted(df.columns)
    rows = sorted("|".join(norm(r[c]) for c in cols) for r in df.collect())
    return len(rows), hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN_DIGESTS))
def test_golden_pin_rows_only_queries(spark, sf_dir, name):
    if sf_dir != GOLDEN_SF_DIR:
        pytest.skip("golden digests pinned at sf0.001")
    import __spark_entry__ as entry

    n, digest = _golden_digest(entry.queries()[name](spark, sf_dir))
    assert (n, digest) == GOLDEN_DIGESTS[name], (
        f"{name}: output drifted from pinned golden "
        f"(got {n} rows, digest {digest})"
    )


def test_golden_pin_minhash_lsh_ml_pair_count(spark, sf_dir):
    """pyspark.ml MinHashLSH under its fixed seed: exact candidate-pair
    count pinned (the pair SET is seed-stable; pinning the count keeps
    the check cheap — 85k pairs at sf0.001, threshold 0.5)."""
    if sf_dir != GOLDEN_SF_DIR:
        pytest.skip("pinned at sf0.001")
    import __spark_entry__ as entry

    assert entry.queries()["llm_minhash_lsh_ml"](spark, sf_dir).count() == 85363


def test_golden_pin_ann_recall_values(spark, sf_dir):
    """The recall gauge itself is deterministic (seeded kmeans, seeded
    hyperplanes, exact brute-force truth): pin the reported recalls.
    The ORDERING ivf > multiprobe > single-probe is the load-bearing
    claim (data-adaptive cells beat oblivious planes on
    near-orthogonal synthetic embeddings; probing recovers loss)."""
    if sf_dir != GOLDEN_SF_DIR:
        pytest.skip("pinned at sf0.001")
    import __spark_entry__ as entry

    r = {
        row["index"]: row["recall_at_5"]
        for row in entry.queries()["llm_ann_recall"](spark, sf_dir).collect()
    }
    assert abs(r["ivf"] - 0.625) < 1e-9
    assert abs(r["lsh"] - 0.125) < 1e-9
    assert abs(r["lsh_mp4"] - 0.4) < 1e-9
    assert abs(r["lsh_mt4"] - 0.375) < 1e-9
    # round 8: the quantized family — exact rerank pulls the 8-byte
    # indexes ABOVE flat IVF at this corpus size (the 4k candidate
    # window covers most of the 500-vector corpus)
    assert abs(r["pq"] - 0.725) < 1e-9
    assert abs(r["ivfpq"] - 0.7) < 1e-9
    assert r["ivf"] > r["lsh_mp4"] > r["lsh"]
    # OR-amplification lifts single-table recall ~3x even on the
    # LSH-hostile near-orthogonal fixture (clustered-data dominance is
    # pinned in test_operators.py::
    # test_lsh_multitable_recall_dominates_single_table)
    assert r["lsh_mt4"] > r["lsh"]


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    # driver contract: the flagship query must return >0 rows
    assert len(rows) > 0
    assert df.columns
