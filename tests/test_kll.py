"""KLL-shape quantile sketch tests (operators/sketches.py): the
tracked error bound is CERTIFIED (every rank estimate within
err_bound, property-tested), the bound stays within the deterministic
worst-case formula, total weight is exact under build and merge, and
the distributed build/merge/quantile path agrees with the pure-Python
sketch exactly in deterministic mode.
"""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import given, settings, strategies as st

from flask_data_pipes_spark.operators.sketches import (
    KLLSketch,
    kll_build,
    kll_merge,
    kll_quantiles,
)

_SETTINGS = dict(max_examples=25, deadline=None)


def _true_rank(data, x):
    return sum(1 for v in data if v <= x)


def _valid_quantile(data, v, target, err):
    """v is a valid ±err q-quantile iff some rank of v — the interval
    [#(x < v) + 1, #(x <= v)] (duplicates give v a rank RANGE) —
    intersects [target - err, target + err]."""
    lo = sum(1 for x in data if x < v) + 1
    hi = sum(1 for x in data if x <= v)
    return lo <= target + err and hi >= target - err


_values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    min_size=1,
    max_size=800,
)


@given(_values, st.integers(8, 64))
@settings(**_SETTINGS)
def test_kll_certified_rank_bound_and_weight(data, k):
    s = KLLSketch(k)
    s.extend(data)
    # total weight is EXACT (compactions only promote even counts)
    assert sum(1 << l for l, _ in s.items()) == s.n == len(data)
    # every rank estimate is within the sketch's own tracked bound
    probes = data[:50] + [min(data) - 1, max(data) + 1]
    for x in probes:
        assert abs(s.rank(x) - _true_rank(data, x)) <= s.err_bound, (
            x, s.rank(x), _true_rank(data, x), s.err_bound,
        )
    # the tracked bound respects the deterministic worst case
    n = len(data)
    cap = (math.log2(max(n, 2)) + 1) * n / (k - 1)
    assert s.err_bound <= cap + 1e-9
    # quantile estimates carry their certificate (rank-estimate error
    # + cumulative-weight overshoot of the selection rule)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        v = s.quantile(q)
        target = int(q * (n - 1)) + 1
        assert _valid_quantile(data, v, target, s.quantile_err_bound()), (
            q, v, target, s.quantile_err_bound(),
        )


@given(_values, _values, st.integers(8, 48))
@settings(**_SETTINGS)
def test_kll_merge_preserves_guarantee(a, b, k):
    sa, sb = KLLSketch(k), KLLSketch(k)
    sa.extend(a)
    sb.extend(b)
    ea, eb = sa.err_bound, sb.err_bound
    sa.merge(sb)
    data = a + b
    assert sa.n == len(data)
    assert sum(1 << l for l, _ in sa.items()) == len(data)
    # merged bound = parts + merge compactions, and still certifies
    assert sa.err_bound >= ea + eb
    for x in data[:40]:
        assert abs(sa.rank(x) - _true_rank(data, x)) <= sa.err_bound


def test_kll_determinism_and_order_insensitive_rebuild():
    rng = random.Random(11)
    data = [rng.uniform(0, 1000) for _ in range(5000)]
    s1, s2 = KLLSketch(64), KLLSketch(64)
    s1.extend(data)
    s2.extend(data)
    assert list(s1.items()) == list(s2.items())
    assert s1.err_bound == s2.err_bound
    rows = list(s1.items())
    r1 = KLLSketch.from_rows(rows, 64)
    rng.shuffle(rows)
    r2 = KLLSketch.from_rows(rows, 64)
    assert sorted(r1.items()) == sorted(r2.items())
    assert r1.n == r2.n == len(data)


def test_kll_validation():
    with pytest.raises(ValueError, match=">= 8"):
        KLLSketch(4)
    s = KLLSketch(8)
    with pytest.raises(ValueError, match="empty"):
        s.quantile(0.5)
    s.update(1.0)
    with pytest.raises(ValueError, match="q must be"):
        s.quantile(1.5)
    with pytest.raises(ValueError, match="equal k"):
        s.merge(KLLSketch(16))


def test_kll_error_decays_with_k():
    rng = random.Random(3)
    data = [rng.gauss(0, 1) for _ in range(20000)]
    errs = {}
    for k in (16, 64, 256):
        s = KLLSketch(k)
        s.extend(data)
        worst = max(
            abs(_true_rank(data, s.quantile(q)) - (int(q * (len(data) - 1)) + 1))
            for q in (0.1, 0.5, 0.9, 0.99)
        )
        errs[k] = worst
    assert errs[256] < errs[16]
    # and the k=256 sketch is genuinely tight (< 1% rank error here)
    assert errs[256] < 0.01 * len(data)


# --- distributed path ---------------------------------------------------------


def test_kll_spark_matches_pure_python(spark):
    rng = random.Random(23)
    rows = [(i, rng.uniform(0, 10000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x double")
    sk = kll_merge(kll_build(df, "x", k=96, id_col="id", partitions=8), k=96)
    got = {
        r["q"]: (r["value"], r["n"])
        for r in kll_quantiles(sk, (0.1, 0.5, 0.9, 0.99)).collect()
    }
    # rebuild the identical sketch in pure Python: replicate the BUILD
    # path's actual routing (repartition(n, expr) HASHES the expr, so
    # read the physical partition id back from Spark rather than
    # assuming expr == partition), same within-partition order, same
    # order-insensitive merge
    from flask_data_pipes_spark.functions.text import md5_long
    import pyspark.sql.functions as F

    routed = (
        df.select("x", md5_long(F.col("id"), 7).alias("h"))
        .repartition(8, F.pmod(F.col("h"), F.lit(8)))
        .sortWithinPartitions("h")
        .withColumn("pid", F.spark_partition_id())
        .collect()  # preserves partition order + within-partition order
    )
    parts: dict = {}
    for r in routed:
        parts.setdefault(r["pid"], []).append(r["x"])
    shards = []
    for p in sorted(parts):
        s = KLLSketch(96)
        s.extend(parts[p])
        shards.append(s)
    merged = KLLSketch.from_rows(
        [it for s in shards for it in s.items()], 96
    )
    data = [x for _, x in rows]
    for q in (0.1, 0.5, 0.9, 0.99):
        v, n = got[q]
        assert n == len(rows)
        assert v == merged.quantile(q)
        # certified bound vs exact data
        target = int(q * (len(data) - 1)) + 1
        assert _valid_quantile(data, v, target, merged.quantile_err_bound())


def test_kll_build_default_mode_no_shuffle(spark):
    df = spark.range(10000).selectExpr(
        "id", "cast(id % 997 as double) as x"
    )
    out = kll_build(df, "x", k=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # merged result still counts every row exactly
    n = kll_quantiles(kll_merge(out, k=64), (0.5,)).collect()[0]["n"]
    assert n == 10000


def test_kll_rank_matches_pure_python(spark):
    from flask_data_pipes_spark.operators.sketches import kll_rank

    rng = random.Random(31)
    rows = [(i, rng.uniform(0, 1000)) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, x double")
    sk_df = kll_merge(kll_build(df, "x", k=64, id_col="id", partitions=4), k=64)
    probes = [-1.0, 100.0, 500.0, 900.0, 1001.0]
    got = {r["x"]: (r["rank_est"], r["n"]) for r in kll_rank(sk_df, probes).collect()}
    sk = KLLSketch.from_rows(
        [(r["level"], r["value"]) for r in sk_df.collect()], 64
    )
    data = [x for _, x in rows]
    # from_rows resets err_bound (it cannot know the build's compaction
    # history), so certify against the deterministic worst-case formula
    cap = (math.log2(len(data)) + 1) * len(data) / 63
    for x in probes:
        rank_est, n = got[x]
        assert n == len(rows)
        assert rank_est == sk.rank(x)
        assert abs(rank_est - _true_rank(data, x)) <= cap
    assert got[-1.0][0] == 0 and got[1001.0][0] == len(rows)


# --- Misra-Gries heavy hitters -------------------------------------------------


from flask_data_pipes_spark.operators.sketches import (  # noqa: E402
    MGSketch,
    mg_build,
    mg_merge,
    mg_topk,
)

_items = st.lists(st.integers(0, 30), min_size=1, max_size=600)


@given(_items, st.integers(1, 20))
@settings(**_SETTINGS)
def test_mg_certificate_and_bound(data, k):
    s = MGSketch(k)
    s.extend(data)
    from collections import Counter

    true = Counter(data)
    n = len(data)
    # the self-certificate: est <= true <= est + dec, for EVERY item
    for it, t in true.items():
        e = s.estimate(it)
        assert e <= t <= e + s.dec, (it, e, t, s.dec)
    # items never seen estimate 0
    assert s.estimate("nope") == 0
    # the deterministic bound: dec <= n/(k+1)
    assert s.dec <= n / (k + 1)
    # guaranteed presence: true count > dec => item is in the summary
    for it, t in true.items():
        if t > s.dec:
            assert it in s.counters, (it, t, s.dec)
    assert len(s.counters) <= k


@given(_items, _items, st.integers(1, 16))
@settings(**_SETTINGS)
def test_mg_merge_preserves_certificate(a, b, k):
    from collections import Counter

    sa, sb = MGSketch(k), MGSketch(k)
    sa.extend(a)
    sb.extend(b)
    sa.merge(sb)
    true = Counter(a + b)
    n = len(a) + len(b)
    for it, t in true.items():
        e = sa.estimate(it)
        assert e <= t <= e + sa.dec, (it, e, t, sa.dec)
    assert sa.dec <= n / (k + 1)
    assert len(sa.counters) <= k


def test_mg_spark_matches_pure_python(spark):
    from collections import Counter

    rng = random.Random(41)
    # zipf-ish: a few heavy items over a long tail
    pool = [f"w{i}" for i in range(200)]
    rows = [
        (pool[min(int(rng.paretovariate(1.2)) - 1, 199)],)
        for _ in range(8000)
    ]
    df = spark.createDataFrame(rows, "tok string")
    merged = mg_merge(mg_build(df, "tok", k=32), k=32)
    out = merged.collect()
    dec = out[0]["dec"] if out else 0
    est = {r["item"]: r["cnt"] for r in out}
    assert len(est) <= 32
    true = Counter(t for (t,) in rows)
    n = len(rows)
    assert dec <= n / 33
    for it, t in true.items():
        e = est.get(it, 0)
        assert e <= t <= e + dec, (it, e, t, dec)
        if t > dec:
            assert it in est
    # top-k view: ordered, bounds consistent
    top = mg_topk(merged, 5).collect()
    assert [r["est"] for r in top] == sorted(
        (r["est"] for r in top), reverse=True
    )
    for r in top:
        assert r["est_max"] == r["est"] + dec
    # the true #1 heavy item is found and ranked first
    heavy, t_heavy = true.most_common(1)[0]
    assert t_heavy > dec and top[0]["item"] == heavy


def test_mg_build_no_shuffle_and_merge_tree(spark):
    df = spark.range(20000).selectExpr("cast(id % 37 as string) as tok")
    built = mg_build(df, "tok", k=64)
    plan = built._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # two-stage tree merge equals direct merge on estimates
    one = {r["item"]: r["cnt"] for r in mg_merge(built, k=64).collect()}
    tree = {
        r["item"]: r["cnt"]
        for r in mg_merge(mg_merge(built, k=64, partitions=4), k=64).collect()
    }
    # 37 distinct items < k: both are EXACT counts, so they agree
    assert one == tree
    assert sum(one.values()) == 20000


def test_mg_validation():
    import pytest as _pt

    with _pt.raises(ValueError, match=">= 1"):
        MGSketch(0)
    with _pt.raises(ValueError, match="equal k"):
        MGSketch(4).merge(MGSketch(8))


def test_mg_unioned_builds_certificate(spark):
    """ADVICE r10: two mg_build outputs UNIONED (per-day summaries
    appended to one table) must merge as DISTINCT sketches — decrements
    add across builds, so est <= true <= est + dec holds on the union
    even though the two builds' partition numbers collide."""
    from collections import Counter

    k = 4
    # k=4 forces decrements in both builds: >4 distinct items each
    rows_a = [(f"a{i % 7}",) for i in range(500)] + [("hot",)] * 300
    rows_b = [(f"b{i % 9}",) for i in range(400)] + [("hot",)] * 200
    da = spark.createDataFrame(rows_a, "tok string").repartition(3)
    db = spark.createDataFrame(rows_b, "tok string").repartition(3)
    built_a = mg_build(da, "tok", k=k)
    built_b = mg_build(db, "tok", k=k)
    # sids are distinct across the two builds (fresh uuid per call)
    sids_a = {r["sid"] for r in built_a.select("sid").distinct().collect()}
    sids_b = {r["sid"] for r in built_b.select("sid").distinct().collect()}
    assert not (sids_a & sids_b)
    merged = mg_merge(built_a.unionByName(built_b), k=k).collect()
    dec = merged[0]["dec"] if merged else 0
    est = {r["item"]: r["cnt"] for r in merged}
    true = Counter(t for (t,) in rows_a + rows_b)
    n = sum(true.values())
    assert dec <= n / (k + 1)
    for it, t in true.items():
        e = est.get(it, 0)
        assert e <= t <= e + dec, (it, e, t, dec)
        if t > dec:
            assert it in est
    assert "hot" in est  # 500 occurrences, guaranteed present


def test_mg_sid_collision_raises(spark):
    """Forcing one build_id onto two different builds is exactly the
    silent-certificate-void ADVICE r10 flagged — the merge kernel must
    refuse the duplicate (sid, item) rows instead of fusing them."""
    import pytest as _pt

    df = spark.createDataFrame(
        [(f"w{i % 5}",) for i in range(100)], "tok string"
    ).coalesce(1)
    a = mg_build(df, "tok", k=8, build_id="same")
    b = mg_build(df, "tok", k=8, build_id="same")
    with _pt.raises(Exception, match="duplicate \\(sid, item\\)"):
        mg_merge(a.unionByName(b), k=8).collect()


def test_mg_sid_collision_disjoint_items_raises(spark):
    """ADVICE r11: two sketches fused on one sid with EQUAL dec and
    DISJOINT item sets used to slide past the duplicate-(sid,item) and
    inconsistent-dec guards — counters added while dec was counted
    once, silently voiding est <= true <= est + dec. The nrows
    checksum closes it: same-size sketches double the observed row
    count, different-size sketches disagree on the declared nrows."""
    import pytest as _pt

    # same size (2 items each, dec=0): observed 4 rows vs nrows=2
    da = spark.createDataFrame([("a",), ("b",)], "tok string").coalesce(1)
    db = spark.createDataFrame([("c",), ("d",)], "tok string").coalesce(1)
    a = mg_build(da, "tok", k=8, build_id="same")
    b = mg_build(db, "tok", k=8, build_id="same")
    with _pt.raises(Exception, match="declared nrows"):
        mg_merge(a.unionByName(b), k=8).collect()
    # different sizes (2 vs 3 items, dec=0 both): nrows disagreement
    dc = spark.createDataFrame(
        [("c",), ("d",), ("e",)], "tok string"
    ).coalesce(1)
    c = mg_build(dc, "tok", k=8, build_id="same")
    with _pt.raises(Exception, match="inconsistent nrows"):
        mg_merge(a.unionByName(c), k=8).collect()


def test_mg_deterministic_build_id(spark):
    df = spark.createDataFrame([("x",), ("y",)], "tok string").coalesce(1)
    out = mg_build(df, "tok", k=8, build_id="epoch7").collect()
    assert {r["sid"] for r in out} == {"epoch7-0"}


def test_mg_merge_order_insensitive_lossy_regime(spark):
    """mg_merge's m-way single-cut fold is order-insensitive: two fresh
    builds of the same data (fresh random build_ids each run, so the
    per-sid fold order differs) must merge to IDENTICAL counters and
    dec even in the lossy regime (k < distinct items), where a pairwise
    cut cascade would depend on accumulation order (round-11 review)."""
    rows = [(f"w{i % 23}",) for i in range(2000)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, "tok string").repartition(6)
    k = 4  # k << 24 distinct -> cuts definitely fire

    def run():
        out = mg_merge(mg_build(df, "tok", k=k), k=k).collect()
        dec = out[0]["dec"] if out else 0
        return {r["item"]: r["cnt"] for r in out}, dec

    a, dec_a = run()
    b, dec_b = run()
    assert a == b and dec_a == dec_b
    # m-way fold: the merged dec is sum(per-build decs) + at most ONE cut
    built = mg_build(df, "tok", k=k, build_id="x").collect()
    per_sid_dec = {}
    for r in built:
        per_sid_dec[r["sid"]] = r["dec"]
    assert dec_a >= sum(per_sid_dec.values())
    assert "hot" in a  # 400 >> dec certificate keeps the heavy item


def test_mg_build_empty_wipe_partition_keeps_dec(spark):
    """Round-11 regression (found by the m-way merge's tighter dec): a
    partition whose sketch ends with EMPTY counters (a decrement round
    wiping everything — k+1 distinct items cycling) must still emit its
    decrement total (null-item sentinel row); silently dropping it
    voids est <= true <= est + dec on any merge containing the shard.
    The old pairwise fold's inflated dec masked exactly this."""
    from collections import Counter

    k = 4
    # one partition of 5 distinct items cycling, length % 5 == 0:
    # every round wipes all counters -> final sketch EMPTY, dec = n/5
    wipe = [(f"w{i % 5}",) for i in range(100)]
    df_w = spark.createDataFrame(wipe, "tok string").coalesce(1)
    built = mg_build(df_w, "tok", k=k, build_id="wipe")
    rows = built.collect()
    assert len(rows) == 1 and rows[0]["item"] is None
    assert rows[0]["cnt"] == 0 and rows[0]["dec"] == 20
    # union with a second build; certificate must hold on the union
    other = [("x",)] * 30 + [(f"w{i % 5}",) for i in range(50)]
    df_o = spark.createDataFrame(other, "tok string").coalesce(1)
    merged = mg_merge(
        built.unionByName(mg_build(df_o, "tok", k=k)), k=k
    ).collect()
    dec = merged[0]["dec"] if merged else 0
    est = {r["item"]: r["cnt"] for r in merged if r["item"] is not None}
    true = Counter(t for (t,) in wipe + other)
    for it, t in true.items():
        e = est.get(it, 0)
        assert e <= t <= e + dec, (it, e, t, dec)
    # the topk view never surfaces the bookkeeping sentinel
    top = mg_topk(
        mg_merge(built.unionByName(mg_build(df_o, "tok", k=k)), k=k), 10
    ).collect()
    assert all(r["item"] is not None for r in top)
