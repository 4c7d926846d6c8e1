"""URL operators (functions/url.py) — canonicalization, registrable
domain, URL dedup, and the WARC → url dedup → per-domain cap
composition (round 15, VERDICT r14 "What's missing" #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.functions.url import (
    registrable_domain,
    url_host,
    url_normalize,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"]
        for r in df.select(url_normalize("url").alias("n")).collect()
    ]


def test_url_normalize_rules(spark):
    cases = {
        # scheme + host lowercase, default port dropped
        "HTTP://WWW.Example.COM:80/Path": "http://www.example.com/Path",
        "https://Example.com:443/a": "https://example.com/a",
        # non-default port kept
        "http://example.com:8080/a": "http://example.com:8080/a",
        # fragment dropped
        "http://example.com/a#section-2": "http://example.com/a",
        # tracking params dropped, the rest SORTED
        "http://e.com/p?utm_source=tw&b=2&a=1&gclid=xyz": "http://e.com/p?a=1&b=2",
        "http://e.com/p?utm_campaign": "http://e.com/p",
        "http://e.com/p?fbclid=1&msclkid=2&mc_eid=3": "http://e.com/p",
        # trailing slashes stripped (root too)
        "http://example.com/": "http://example.com",
        "http://example.com/a/b///": "http://example.com/a/b",
        # userinfo stripped with the authority rules
        "http://user:pw@Example.com/x": "http://example.com/x",
        # query with no path
        "http://e.com?b=2&a=1": "http://e.com?a=1&b=2",
        # non-URL strings pass through trimmed, never NULLed
        "  not a url  ": "not a url",
        "": "",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())
    # NULL-safe
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(url_normalize("url")).collect()[0][0] is None
    # idempotent: normalize(normalize(u)) == normalize(u)
    df2 = spark.createDataFrame([(u,) for u in cases], "url string")
    twice = df2.select(
        url_normalize(url_normalize("url")).alias("a"),
        url_normalize("url").alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in twice)


def test_url_host_and_registrable_domain(spark):
    cases = [
        ("https://news.BBC.co.uk/story", "news.bbc.co.uk", "bbc.co.uk"),
        ("http://a.b.example.com/x", "a.b.example.com", "example.com"),
        ("http://example.com", "example.com", "example.com"),
        ("http://Site.COM.au:8080/", "site.com.au", "site.com.au"),
        ("http://deep.sub.site.com.au/x", "deep.sub.site.com.au",
         "site.com.au"),
        ("http://localhost/x", "localhost", "localhost"),
        # 2-letter TLD without a second-level marker: last two labels
        ("http://thing.io/x", "thing.io", "thing.io"),
        ("http://pages.thing.io/x", "pages.thing.io", "thing.io"),
    ]
    df = spark.createDataFrame(
        [(u,) for u, _, _ in cases], "url string"
    )
    got = df.select(
        url_host("url").alias("h"), registrable_domain("url").alias("d")
    ).collect()
    for (u, wh, wd), r in zip(cases, got):
        assert r["h"] == wh, u
        assert r["d"] == wd, u
    # bare hosts work too (the WARC target_uri is always a full URL,
    # but the cap key should accept either)
    bare = spark.createDataFrame(
        [("News.BBC.co.uk",), ("sub.example.com",)], "h string"
    )
    assert [
        r[0] for r in bare.select(registrable_domain("h")).collect()
    ] == ["bbc.co.uk", "example.com"]


def test_warc_url_dedup_domain_cap_composition(spark, tmp_path):
    """The production first-filter chain from raw archive bytes:
    WARC records → url_normalize → URL-level exact dedup (min doc id
    per canonical URL) → registrable_domain key → group_reservoir
    per-domain cap. The same page crawled with tracking params, a
    fragment, and mixed case collapses to ONE row; the big domain is
    capped at k."""
    import os

    from flask_data_pipes_spark.operators.corpus import group_reservoir
    from flask_data_pipes_spark.sources.warc import (
        build_warc_bytes,
        warc_records,
        wet_documents,
    )

    def rec(i, uri):
        return (
            {
                "WARC-Type": "conversion",
                "WARC-Record-ID": f"<urn:uuid:u{i}>",
                "WARC-Target-URI": uri,
                "WARC-Date": "2024-01-01T00:00:00Z",
                "Content-Type": "text/plain",
            },
            f"body {i}".encode(),
        )

    recs = [
        # three spellings of ONE canonical URL on bigsite
        rec(0, "http://BigSite.com/story/1?utm_source=a"),
        rec(1, "http://bigsite.com/story/1#frag"),
        rec(2, "http://bigsite.com:80/story/1"),
        # five more distinct bigsite pages (domain total: 6 candidates)
        *[rec(3 + j, f"http://bigsite.com/story/{2 + j}") for j in range(5)],
        # two pages on a small co.uk domain
        rec(8, "https://tiny.co.uk/a"),
        rec(9, "https://sub.tiny.co.uk/b"),
    ]
    d = str(tmp_path)
    with open(os.path.join(d, "urls.warc"), "wb") as fh:
        fh.write(build_warc_bytes(recs))

    docs = wet_documents(warc_records(spark, d), id_col="rid").select(
        F.regexp_extract("rid", r"u(\d+)", 1).cast("long").alias("doc_id"),
        "url",
        "text",
    )
    canon = docs.withColumn("url_norm", url_normalize("url"))
    deduped = canon.groupBy("url_norm").agg(
        F.min("doc_id").alias("doc_id"),
        F.expr("min_by(text, doc_id)").alias("text"),
    )
    assert deduped.count() == 8  # 10 records, 3 collapse to 1
    keep = (
        deduped.filter(F.col("doc_id") == 0).collect()
    )
    assert len(keep) == 1 and keep[0]["url_norm"] == "http://bigsite.com/story/1"

    capped = group_reservoir(
        deduped.withColumn("domain", registrable_domain("url_norm")),
        by="domain",
        k=4,
    )
    by_dom = {
        r["domain"]: r["n"]
        for r in capped.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_dom == {"bigsite.com": 4, "tiny.co.uk": 2}
    # deterministic: the same cap picks the same rows on a re-run
    again = group_reservoir(
        deduped.withColumn("domain", registrable_domain("url_norm")),
        by="domain",
        k=4,
    )
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
