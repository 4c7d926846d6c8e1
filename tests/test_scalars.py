"""Unit tests for the scalar function library (SURVEY §2.2, P5-P18) —
semantics pinned to the reference's helpers (utils.py / fields.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.functions import scalars as S


def _vals(spark, expr, rows, dtype="string"):
    df = spark.createDataFrame([(r,) for r in rows], f"v {dtype}")
    return [r[0] for r in df.select(expr.alias("out")).collect()]


def test_case_folding(spark):
    assert _vals(spark, S.lowercase("v"), ["AbC", None]) == ["abc", None]
    assert _vals(spark, S.uppercase("v"), ["AbC", None]) == ["ABC", None]


def test_titlecase_python_semantics(spark):
    # Python str.title() boundaries: apostrophes, dashes, digits
    cases = ["o'neil smith", "jean-luc", "abc1def", "HELLO WORLD", None, ""]
    out = _vals(spark, S.titlecase("v"), cases)
    expected = [c.title() if c is not None else None for c in cases]
    assert out == expected


def test_booler_table(spark):
    rows = ["yes", "Y", "1", "TRUE", "t", "no", "N", "0", "False", "f", "", None]
    out = _vals(spark, S.booler("v", strict=False), rows)
    assert out == [True] * 5 + [False] * 5 + [None, None]
    # lenient mode: unknown token → NULL
    assert _vals(spark, S.booler("v", strict=False), ["maybe"]) == [None]
    # strict mode: unknown token raises (reference ValueError)
    with pytest.raises(Exception):
        _vals(spark, S.booler("v", strict=True), ["maybe"])


def test_recasts(spark):
    assert _vals(spark, S.recast_null("v"), ["", "x", None]) == [None, "x", None]
    assert _vals(spark, S.recast_mac("v"), ["aa-bb-cc", None]) == ["aa:bb:cc", None]
    assert _vals(spark, S.strip_trailing_slash("v"), ["a/", "a", None]) == [
        "a",
        "a",
        None,
    ]
    assert _vals(spark, S.recast_ip("v"), [3232235777, 0, 4294967295, -1, None], "long") == [
        "192.168.1.1",
        "0.0.0.0",
        "255.255.255.255",
        None,
        None,
    ]
    assert _vals(
        spark, S.ip_to_int("v"), ["192.168.1.1", "0.0.0.0", "10.0.0.1/24", "bogus", None]
    ) == [3232235777, 0, 167772161, None, None]


def test_recast_timestamp(spark):
    out = _vals(spark, S.recast_timestamp("v"), [0, 1700000000000, None], "long")
    assert str(out[0]) == "1970-01-01 00:00:00"
    assert str(out[1]).startswith("2023-11-14")
    assert out[2] is None


def test_splitter_hostname(spark):
    assert _vals(spark, S.splitter("v", right=True), ["DOM\\host", "plain", None]) == [
        "host",
        "plain",
        None,
    ]
    assert _vals(spark, S.splitter("v", left=True), ["DOM\\host"]) == ["DOM"]
    rows = ["CORP\\web01", "web01.corp.example.com", "web01", None]
    parsed = [
        tuple(r)
        for r in _vals(spark, S.parse_hostname("v"), rows)
    ]
    assert parsed[0] == ("WEB01", "CORP", None)
    assert parsed[1] == ("WEB01", None, "web01.corp.example.com")
    assert parsed[2] == ("WEB01", None, None)
    assert parsed[3] == (None, None, None)


def test_content_hash_is_sha224(spark):
    import hashlib

    out = _vals(spark, S.content_hash("v"), ["hello"])
    assert out[0] == hashlib.sha224(b"hello").hexdigest()  # reference quirk


def test_cidr_hosts(spark):
    out = _vals(spark, S.cidr_hosts("v"), ["10.0.0.5/32", "10.0.0.4/30", "10.0.0.0/31", "bad", None])
    assert out[0] == ["10.0.0.5"]
    assert out[1] == ["10.0.0.5", "10.0.0.6"]  # network+broadcast excluded
    assert out[2] == ["10.0.0.0", "10.0.0.1"]  # /31 both (ipaddress.hosts())
    assert out[3] is None and out[4] is None


def test_flatten_deep(spark):
    df = spark.createDataFrame(
        [([[1, 2], [3]],)], "v array<array<int>>"
    )
    assert df.select(S.flatten_deep("v", 1).alias("o")).collect()[0][0] == [1, 2, 3]


def test_camel_to_snake():
    assert S.camel_to_snake_case("CamelCaseName") == "camel_case_name"
    assert S.camel_to_snake_case("HTTPResponse") == "http_response"
    assert S.camel_to_snake_case("already_snake") == "already_snake"
