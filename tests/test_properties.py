"""Property tests (SURVEY §5.4): scalar ops are null-safe and agree with
their Python reference semantics on arbitrary inputs; explode preserves
row-count invariants; resume is idempotent.

Pattern: hypothesis generates one BATCH of inputs per test, evaluated in
a single Spark job against a pure-Python model of the reference behavior
(one job per test, not per example — Spark jobs are too slow for
per-example shrinking)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flask_data_pipes_spark.functions import scalars as S
from flask_data_pipes_spark.functions import text as T

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texty = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=40,
    ),
)


def _run(spark, values, expr, out_type="string"):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["o"] for r in df.select(expr.alias("o")).collect()]


@given(st.lists(texty, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_case_folding_matches_python(spark, vals):
    got = _run(spark, vals, S.lowercase("v"))
    want = [None if v is None else v.lower() for v in vals]
    assert got == want
    got_u = _run(spark, vals, S.uppercase("v"))
    want_u = [None if v is None else v.upper() for v in vals]
    assert got_u == want_u


@given(st.lists(texty, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_recast_null_blank_to_none(spark, vals):
    got = _run(spark, vals, S.recast_null("v"))
    want = [None if (v is None or v == "") else v for v in vals]
    assert got == want


@given(st.lists(texty, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_strip_trailing_slash_null_safe(spark, vals):
    got = _run(spark, vals, S.strip_trailing_slash("v"))
    for g, v in zip(got, vals):
        if v is None:
            assert g is None
        else:
            assert g == (v[:-1] if v.endswith("/") else v)


@given(st.lists(st.one_of(st.none(), st.integers(-1, 2**32)), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_recast_ip_matches_ipaddress(spark, vals):
    import ipaddress

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r["o"] for r in df.select(S.recast_ip("v").alias("o")).collect()]
    for g, v in zip(got, vals):
        if v is None or not (0 <= v <= 0xFFFFFFFF):
            assert g is None  # invalid → NULL (reference skips silently)
        else:
            assert g == str(ipaddress.ip_address(v))


def _py_tokens(v):
    """Python model of whitespace_tokens' ACTUAL contract: SQL trim
    (strips U+0020 only) + Java-regex \\s split (ASCII ws, limit=-1 so
    edge empties survive). Deliberately NOT str.split(), which strips
    and splits on unicode whitespace like \\xa0 — the engine and its
    DuckDB oracles agree on the SQL/ASCII definition."""
    import re

    if v is None:
        return []
    t = v.strip(" ")
    if t == "":
        return []
    return re.split(r"\s+", t, flags=re.ASCII)


@given(st.lists(texty, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_token_count_matches_python_split(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["o"] for r in df.select(T.token_count("v").alias("o")).collect()]
    want = [len(_py_tokens(v)) for v in vals]
    assert got == want


@given(
    st.lists(
        st.lists(st.integers(-100, 100), max_size=5),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_explode_outer_rowcount_invariant(spark, lists):
    """Denormalize invariant (reference utils.py:39-55): N list items →
    N rows; empty list → exactly one row with NULL."""
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lists)], "id long, xs array<int>"
    )
    out = df.withColumn("xs", F.explode_outer("xs"))
    assert out.count() == sum(max(len(l), 1) for l in lists)
    null_rows = out.filter(F.col("xs").isNull()).count()
    assert null_rows == sum(1 for l in lists if not l)


@given(st.lists(texty, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_quality_score_bounded(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        r["o"] for r in df.select(T.quality_score("v").alias("o")).collect()
    ]
    for g, v in zip(got, vals):
        if v is None:
            continue  # null text → null score is acceptable
        assert g is not None and -1e-9 <= g <= 1.0 + 1e-9 and not math.isnan(g)
