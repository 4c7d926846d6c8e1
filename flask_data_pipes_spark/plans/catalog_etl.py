r"""ETL-vocabulary catalog entries — the reference's operator inventory
(SURVEY.md §2.2-2.5) exercised as oracle-checked queries over the
synthetic tables.

Each query *constructs* reference-shaped inputs (hostnames, MACs, IP
ints, bool tokens, CIDRs...) deterministically from table columns, then
applies the engine's scalar operators; the DuckDB oracle mirrors both
the construction and the operator semantics in ANSI SQL. This pins the
operator semantics (not just the relational plumbing) to the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from .catalog import load, register

# '\x01' sentinel used by the DuckDB titlecase twin (see below).
_SENT = "\x01"


@register(
    "etl_recast_vocab",
    oracle=r"""
    WITH base AS (
      SELECT s_suppkey, s_name,
             CASE s_suppkey % 3
               WHEN 0 THEN 'CORP\' || s_name
               WHEN 1 THEN lower(s_name) || '.corp.example.com'
               ELSE s_name END AS host_raw,
             upper(substr(md5(s_name),1,2) || '-' || substr(md5(s_name),3,2) || '-' ||
                   substr(md5(s_name),5,2) || '-' || substr(md5(s_name),7,2) || '-' ||
                   substr(md5(s_name),9,2) || '-' || substr(md5(s_name),11,2)) AS mac_raw,
             (s_suppkey * 2654435761) % 4294967296 AS ip_int,
             ['yes','n','1','f','true','0','','maybe'][(s_suppkey % 8) + 1] AS bool_raw,
             CASE WHEN s_suppkey % 2 = 0 THEN '' ELSE s_name END AS maybe_empty,
             s_name || CASE WHEN s_suppkey % 2 = 0 THEN '/' ELSE '' END AS maybe_slash
      FROM supplier
    )
    SELECT s_suppkey,
           CASE WHEN contains(host_raw, '\') THEN upper(split_part(host_raw, '\', 2))
                WHEN contains(host_raw, '.') THEN upper(split_part(host_raw, '.', 1))
                ELSE upper(host_raw) END AS host,
           CASE WHEN contains(host_raw, '\') THEN split_part(host_raw, '\', 1) END AS domain,
           CASE WHEN NOT contains(host_raw, '\') AND contains(host_raw, '.')
                THEN host_raw END AS fqdn,
           replace(mac_raw, '-', ':') AS mac,
           ((ip_int >> 24) & 255)::VARCHAR || '.' || ((ip_int >> 16) & 255)::VARCHAR || '.' ||
           ((ip_int >> 8) & 255)::VARCHAR || '.' || (ip_int & 255)::VARCHAR AS ip_str,
           ip_int AS ip_roundtrip,
           CASE WHEN bool_raw IS NULL OR bool_raw = '' THEN NULL
                WHEN lower(bool_raw) IN ('yes','y','1','true','t') THEN TRUE
                WHEN lower(bool_raw) IN ('no','n','0','false','f') THEN FALSE
                ELSE NULL END AS bool_val,
           nullif(maybe_empty, '') AS null_recast,
           CASE WHEN ends_with(maybe_slash, '/')
                THEN substr(maybe_slash, 1, length(maybe_slash) - 1)
                ELSE maybe_slash END AS no_slash,
           epoch_ms(s_suppkey * 86400000 + 123) AS ts,
           split_part('ACME\' || s_name, '\', 2) AS split_right,
           split_part('ACME\' || s_name, '\', 1) AS split_left,
           lower(s_name) AS lower_name, upper(s_name) AS upper_name
    FROM base
    """,
)
def etl_recast_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-operator vocabulary (P5, P6, P8-P13, P15, P17; SURVEY §2.2)
    applied to reference-shaped inputs constructed from `supplier`.

    Scale: pure narrow map — no shuffle; codegen keeps the whole row
    pipeline in one stage.
    """
    s = load(spark, sf_dir, "supplier")
    k, name = F.col("s_suppkey"), F.col("s_name")
    md5 = F.md5(name)
    host_raw = (
        F.when(k % 3 == 0, F.concat(F.lit("CORP\\"), name))
        .when(k % 3 == 1, F.concat(F.lower(name), F.lit(".corp.example.com")))
        .otherwise(name)
    )
    mac_raw = F.upper(
        F.concat_ws(
            "-",
            *[F.substring(md5, i, 2) for i in (1, 3, 5, 7, 9, 11)],
        )
    )
    ip_int = (k * 2654435761) % F.lit(4294967296)
    bool_raw = F.element_at(
        F.array(*[F.lit(x) for x in ["yes", "n", "1", "f", "true", "0", "", "maybe"]]),
        (k % 8 + 1).cast("int"),
    )
    maybe_empty = F.when(k % 2 == 0, F.lit("")).otherwise(name)
    maybe_slash = F.concat(name, F.when(k % 2 == 0, F.lit("/")).otherwise(F.lit("")))
    parsed = S.parse_hostname(host_raw)
    return s.select(
        k,
        parsed.getField("host").alias("host"),
        parsed.getField("domain").alias("domain"),
        parsed.getField("fqdn").alias("fqdn"),
        S.recast_mac(mac_raw).alias("mac"),
        S.recast_ip(ip_int).alias("ip_str"),
        S.ip_to_int(S.recast_ip(ip_int)).alias("ip_roundtrip"),
        S.booler(bool_raw, strict=False).alias("bool_val"),
        S.recast_null(maybe_empty).alias("null_recast"),
        S.strip_trailing_slash(maybe_slash).alias("no_slash"),
        S.recast_timestamp(k * 86400000 + 123).alias("ts"),
        S.splitter(F.concat(F.lit("ACME\\"), name), right=True).alias("split_right"),
        S.splitter(F.concat(F.lit("ACME\\"), name), left=True).alias("split_left"),
        S.lowercase(name).alias("lower_name"),
        S.uppercase(name).alias("upper_name"),
    )


@register(
    "etl_titlecase",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey,
             'o''neil-' || lower(c_mktsegment) || ' ' || c_name AS messy
      FROM customer
    )
    SELECT c_custkey,
           array_to_string(
             list_transform(
               string_split(regexp_replace(lower(messy), '([^a-z])', '\\1{_SENT}', 'g'), '{_SENT}'),
               p -> upper(substr(p, 1, 1)) || substr(p, 2)
             ), '') AS title_name
    FROM base
    """,
)
def etl_titlecase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python-`str.title()` semantics (P5, reference utils.py:122-128) on
    a messy constructed string (apostrophes, dashes, digits).

    The oracle reproduces the same boundary rule with an RE2-safe
    sentinel insert (DuckDB lacks lookbehind; Spark uses it directly).
    """
    c = load(spark, sf_dir, "customer")
    messy = F.concat(
        F.lit("o'neil-"), F.lower(F.col("c_mktsegment")), F.lit(" "), F.col("c_name")
    )
    return c.select(
        F.col("c_custkey"), S.titlecase(messy).alias("title_name")
    )


@register(
    "etl_denormalize",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(words) = 0 THEN [NULL]::VARCHAR[] ELSE words END) AS word
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN []::VARCHAR[]
                  ELSE (string_split(text, ' '))[1:5] END AS words
      FROM documents
    )
    """,
)
def etl_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalize (X1, reference utils.py:39-55): the single
    table-generating operator. `explode_outer` reproduces the exact
    contract: N items → N rows; empty list → ONE row with NULL; the
    oracle emulates the empty→NULL-row rule with a [NULL] substitution
    (plain `unnest` would drop the row).

    Scale: explode is a narrow op — no shuffle, fan-out streamed.
    """
    d = load(spark, sf_dir, "documents")
    words = F.when(
        F.col("doc_id") % 10 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(F.col("text"), " ", -1), 1, 5))
    return d.select(
        F.col("doc_id"), F.explode_outer(words).alias("word")
    )


@register(
    "etl_projection_cast",
    oracle="""
    SELECT event_id AS id,
           upper(event_type) AS type,
           round(value, 2)::DOUBLE AS amount,
           ts::TIMESTAMP AS event_ts,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def etl_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-style schema projection (P1: keep declared fields, apply
    per-field serialization, rename) — the reference's `transform` core
    as one `select`.

    The amount column is round-to-2-then-DOUBLE on BOTH engines: the
    driver harness canonicalizes via pandas, where Spark DECIMAL(12,2)
    arrives as `Decimal` objects but DuckDB DECIMAL floats — a dtype
    artifact, so the gate column is pinned to a common double. The
    DecimalType(12,2) path itself stays covered by unit tests."""
    e = load(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("id"),
        F.upper("event_type").alias("type"),
        F.round(F.col("value").cast("decimal(12,2)"), 2).cast("double").alias("amount"),
        F.col("ts").alias("event_ts"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "etl_union_stages",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'
    """,
)
def etl_union_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch concatenation (reference pipeline.py:540-547: several
    (generator, meta) bundles per stage) = `unionByName`."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(F.col("o_orderstatus") != "F")
    return a.unionByName(b)


@register(
    "etl_content_hash",
    oracle="""
    SELECT doc_id, sha256(text) AS text_sha256, md5(text) AS text_md5
    FROM documents
    """,
)
def etl_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing (P16). The reference's `sha256` helper actually
    computes SHA-224 (utils.py:35-36, documented quirk) — the engine's
    `content_hash` replicates that; this gate query uses SHA-256+md5
    (DuckDB lacks sha224) and unit tests cover the 224 path."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
    )


@register(
    "etl_cidr_explode",
    oracle="""
    WITH base AS (
      SELECT s_suppkey,
             (s_suppkey * 2654435761) % 4294967296 AS ip_int,
             CASE WHEN s_suppkey % 4 = 0 THEN 30 ELSE 32 END AS prefix
    FROM supplier
    ),
    expanded AS (
      SELECT s_suppkey,
             CASE WHEN prefix = 32 THEN [ip_int]
                  ELSE range((ip_int // 4) * 4 + 1, (ip_int // 4) * 4 + 3) END AS hosts
      FROM base
    )
    SELECT s_suppkey,
           ((h >> 24) & 255)::VARCHAR || '.' || ((h >> 16) & 255)::VARCHAR || '.' ||
           ((h >> 8) & 255)::VARCHAR || '.' || (h & 255)::VARCHAR AS ip
    FROM (SELECT s_suppkey, unnest(hosts) AS h FROM expanded)
    """,
)
def etl_cidr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR expansion (X2, reference utils.py:204-217): /32 → itself,
    /30 → the 2 host addresses (network+broadcast excluded), exploded to
    rows. Generator-UDTF semantics as sequence+explode — no UDF."""
    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ip_int = (k * 2654435761) % F.lit(4294967296)
    cidr = F.concat(
        S.recast_ip(ip_int),
        F.when(k % 4 == 0, F.lit("/30")).otherwise(F.lit("/32")),
    )
    return s.select(
        k, F.explode(S.cidr_hosts(cidr)).alias("ip")
    )


@register(
    "etl_lenient_flatten",
    oracle=r"""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS d_iso,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || 'Z' AS ts_iso,
           strftime(o_orderdate, '%H:%M:%S') AS t_iso,
           NULL::VARCHAR AS d_null,
           array_to_string(flatten([[o_orderkey, o_custkey], [o_orderkey % 7]]), ',') AS flat
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def etl_lenient_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lenient date/time serialization (P7, reference fields.py:45-82:
    NULL/string pass through, temporal values ISO-format) and deep
    flatten (P18, utils.py:195-202) as one narrow-map query.

    The flattened array is emitted as a ','-joined STRING on both
    engines: the driver harness sorts result columns with pandas, which
    cannot sort list-valued cells (unhashable) — P7/P18 stay fully
    exercised, the gate column is just the stringified form."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    nested = F.array(
        F.array(F.col("o_orderkey"), F.col("o_custkey")),
        F.array(F.col("o_orderkey") % 7),
    )
    return o.select(
        "o_orderkey",
        S.lenient_date(F.col("o_orderdate").cast("date")).alias("d_iso"),
        S.lenient_timestamp("o_orderdate").alias("ts_iso"),
        S.lenient_time("o_orderdate").alias("t_iso"),
        S.lenient_date(F.lit(None).cast("string")).alias("d_null"),
        F.array_join(
            F.transform(S.flatten_deep(nested, 1), lambda x: x.cast("string")), ","
        ).alias("flat"),
    )
