"""Temporal joins the reference lacks and Spark has no built-in for:
as-of join and bounded range join, expressed as compositions of native
DataFrame ops (no UDFs, no cross products).

The reference (`/root/reference`) has no joins at all (SURVEY.md §2.8);
these belong to the engine's Spark-native superset and are the two
temporal primitives a training-data / event pipeline needs (attach the
latest-known dimension state to a fact; correlate events within a time
window).

Scale design:
- `asof_join` is the union-tag + running-window shape: ONE shuffle per
  side on the equi-keys, then a partition-local sort — identical cost to
  a sort-merge join, with no range fan-out and no per-row right-side
  scan. At 100 TB this beats the textbook `left.join(right, keys &&
  l.ts >= r.ts)` + max-window formulation, which materializes every
  (left × earlier-right) pair before reducing.
- `range_join` is the bucketed equi-join shape: each side lands in
  time buckets of width ~ the window span; the left side fans out only
  to the (usually 2) buckets its window can touch; the join is a plain
  equi-join on (keys, bucket) — AQE-splittable, broadcastable, skew
  handled like any equi-join — followed by the exact range filter.
  Candidate count is linear in data + true matches, never |L|×|R|.

Skew note (both): a single hot key serializes its partition's sort.
For known-hot keys, pre-split by coarse time chunk (e.g. day) and carry
the last right-side row of chunk N into chunk N+1 — documented, not
automated, because chunk choice is data-dependent.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import epoch_us
from ._guards import reject_reserved

__all__ = ["asof_join", "range_join", "gapfill", "scd2_build", "snapshot_diff"]

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_BUCKET = "__rj_bucket"
_GF_US = "__gf_bucket_us"
_GF_PRESENT = "__gf_present"


def _keys(on: Union[str, Sequence[str]]) -> List[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[float] = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with pandas `merge_asof` direction parity: for every
    left row, attach ONE right row sharing the `on` keys —

    - `backward` (default): greatest `right_ts <= left_ts` (DuckDB
      `ASOF JOIN ... ON l.ts >= r.ts`);
    - `forward`: smallest `right_ts >= left_ts` (DuckDB `ON l.ts <=
      r.ts`);
    - `nearest`: whichever of the two sits closer in time; EQUAL
      distances break toward the backward match (pandas' rule,
      pinned in the property test).

    All matches are inclusive at equality; left rows with no match
    keep nulls (left-outer semantics).

    `right_cols` are the payload columns pulled from the right side
    (default: everything but keys and timestamp); they must not collide
    with left column names — rename beforehand. The matched right
    timestamp is emitted as `<right_ts>` (rename it on the right frame
    if the left has the same name). `tolerance` (seconds) nulls the
    payload when the match is further than `tolerance` from `left_ts`
    (in the direction's sense; for `nearest` it applies to each leg
    BEFORE choosing).

    Ties: if several right rows share the exact same (keys, ts), which
    one wins is tie-broken by the last payload column — dedup the right
    side per (keys, ts) upstream if that matters.

    Implementation: tag sides, union, and take a running
    `last(payload, ignorenulls=True)` over (keys) ordered by
    (ts, side) — right rows sort before left rows at equal ts, which
    is what makes the match inclusive. `forward` is the mirror image
    (ts DESC); `nearest` evaluates both windows over the SAME union —
    one Exchange, two partition-local sorts — and picks the smaller
    gap. Never a range fan-out, never a per-row right-side scan.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    keys = _keys(on)
    reject_reserved(
        "asof_join",
        [_SIDE, _PAYLOAD, "__asof_b", "__asof_f"],
        left=left,
        right=right,
    )
    rts = right_ts or left_ts
    payload_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in set(keys) | {rts}]
    )
    if rts == left_ts:
        # Distinct output name for the matched right timestamp.
        rts_out = f"{left_ts}_right"
    else:
        rts_out = rts

    lt = left.withColumn(_SIDE, F.lit(1))
    payload = F.struct(
        F.col(rts).alias(rts_out), *[F.col(c) for c in payload_cols]
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias(left_ts),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    # unionByName with missing columns: left's own columns become null
    # on right rows and vice versa; payload carries the right side.
    u = lt.unionByName(rt, allowMissingColumns=True)
    # backward: ascending (ts, side) — rights sort before lefts at
    # equal ts, so the running last() is inclusive. forward: the exact
    # mirror (ts DESC, side) — rights still first at equal ts.
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).desc(), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tol_us = (
        int(round(tolerance * 1_000_000)) if tolerance is not None else None
    )

    def leg(col_name: str, window) -> "DataFrame":
        nonlocal u
        u = u.withColumn(
            col_name, F.last(_PAYLOAD, ignorenulls=True).over(window)
        )

    def gated(leg_col):
        """Null out a leg whose match is beyond tolerance."""
        if tol_us is None:
            return F.col(leg_col)
        gap = F.abs(
            epoch_us(F.col(left_ts)) - epoch_us(F.col(leg_col)[rts_out])
        )
        return F.when(gap <= F.lit(tol_us), F.col(leg_col))

    if direction in ("backward", "nearest"):
        leg("__asof_b", wb)
    if direction in ("forward", "nearest"):
        leg("__asof_f", wf)

    if direction == "backward":
        chosen = gated("__asof_b")
    elif direction == "forward":
        chosen = gated("__asof_f")
    else:
        b, f = gated("__asof_b"), gated("__asof_f")
        ts_us = epoch_us(F.col(left_ts))
        gap_b = ts_us - epoch_us(b[rts_out])
        gap_f = epoch_us(f[rts_out]) - ts_us
        # equal gaps break toward the backward match (pandas rule)
        chosen = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(gap_f < gap_b, f)
            .otherwise(b)
        )
    out = (
        u.withColumn(_PAYLOAD, chosen)
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, "__asof_b", "__asof_f")
    )
    return out.select(
        *[c for c in left.columns],
        F.col(_PAYLOAD)[rts_out].alias(rts_out),
        *[F.col(_PAYLOAD)[c].alias(c) for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: str = "ts",
    min_delta: float = 0.0,
    max_delta: float = 300.0,
    bucket_width: Optional[float] = None,
) -> DataFrame:
    """Bounded range join: all (left, right) pairs sharing the `on`
    keys with `right_ts - left_ts` in the half-open interval
    `(min_delta, max_delta]` seconds (inner-join semantics). Column
    names other than the keys must be disjoint — rename beforehand.

    Implementation: both sides bucket time at `bucket_width` (default:
    the window span); the left side explodes to every bucket its window
    `(left_ts+min, left_ts+max]` can intersect — ceil(span/width)+1
    buckets, i.e. 2 at the default width — and the join is an ordinary
    equi-join on (keys, bucket) + the exact range predicate. Each true
    pair is produced exactly once (the right row's bucket is unique and
    the left's candidate bucket list is distinct).
    """
    if max_delta <= min_delta:
        raise ValueError("max_delta must exceed min_delta")
    keys = _keys(on)
    reject_reserved("range_join", [_BUCKET], left=left, right=right)
    w_us = int(round((bucket_width or (max_delta - min_delta)) * 1_000_000))
    min_us = int(round(min_delta * 1_000_000))
    max_us = int(round(max_delta * 1_000_000))

    lus = epoch_us(F.col(left_ts))
    rus = epoch_us(F.col(right_ts))
    lo_bucket = F.floor((lus + F.lit(min_us + 1)) / F.lit(w_us))
    hi_bucket = F.floor((lus + F.lit(max_us)) / F.lit(w_us))
    lt = left.withColumn(
        _BUCKET, F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    rt = right.withColumn(_BUCKET, F.floor(rus / F.lit(w_us)))
    delta = epoch_us(F.col(right_ts)) - epoch_us(F.col(left_ts))
    return (
        lt.join(rt, keys + [_BUCKET])
        .filter((delta > min_us) & (delta <= max_us))
        .drop(_BUCKET)
    )


def gapfill(
    df: DataFrame,
    ts: str = "ts",
    by: Optional[Union[str, Sequence[str]]] = None,
    step: float = 3600.0,
    aggs: Optional[Dict[str, Column]] = None,
    fill: Optional[Dict[str, Union[str, Tuple[str, object]]]] = None,
    bounds: Optional[Tuple[str, str]] = None,
) -> DataFrame:
    """Time-bucket aggregation with a DENSE bucket grid — the
    `time_bucket_gapfill` + `locf` shape of hypertable rollups
    (TimescaleDB semantics, reimplemented on native Spark ops).

    The reference (`/root/reference`) has no temporal rollup at all
    (SURVEY.md §2.8); this belongs to the engine's Spark-native
    superset: downsampling event streams into regular time series for
    dashboards / feature windows, where MISSING buckets must appear
    (zero-filled or carried forward), not silently vanish the way a
    plain groupBy(window(...)) leaves holes.

    Args:
      ts: timestamp column; rows bucket to ``floor(epoch/step)*step``.
      by: optional grouping key(s); each group gets its own dense grid.
      step: bucket width in seconds.
      aggs: ``{out_name: aggregate Column}`` computed per (by, bucket).
      fill: per-output fill policy for grid rows with no data:
        ``"locf"`` (last observation carried forward within the group),
        ``"zero"``, ``("const", v)``, or absent → stays NULL.
      bounds: optional ``(start, end)`` timestamp strings for a global
        grid; default is each group's own [min, max] bucket range.

    Output: by keys, `ts` (bucket start, timestamp), one column per
    agg, and boolean ``gap_filled`` (true on synthesized buckets).

    Scale design: the raw scan aggregates FIRST (partial map-side
    combine, one shuffle on (by, bucket)); the grid is built from the
    post-agg extents (`sequence` + `explode` — grid size is
    time-range/step per group, independent of row count) and
    left-joined back at the same grain. LOCF is one running
    `last(ignorenulls)` window per group over the GRID (post-agg
    cardinality, never raw rows). With ``by=None`` the LOCF window is
    a single partition — fine, because the frame it sorts is the
    bucket grid, not the data.
    """
    if aggs is None:
        aggs = {"n": F.count(F.lit(1))}
    keys = [] if by is None else _keys(by)
    reject_reserved("gapfill", [_GF_US, _GF_PRESENT], df=df)
    step_us = int(round(step * 1_000_000))
    if step_us <= 0:
        raise ValueError("step must be positive")
    fill = dict(fill or {})
    unknown = set(fill) - set(aggs)
    if unknown:
        raise ValueError(f"fill refers to unknown outputs: {sorted(unknown)}")

    bucket_us = (
        F.floor(epoch_us(F.col(ts)) / F.lit(step_us)) * F.lit(step_us)
    ).cast("long")
    g = (
        df.withColumn(_GF_US, bucket_us)
        .groupBy(*keys, _GF_US)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn(_GF_PRESENT, F.lit(True))
    )

    if bounds is not None:
        lo = F.lit(bounds[0]).cast("timestamp")
        hi = F.lit(bounds[1]).cast("timestamp")
        lo_us = (
            F.floor(epoch_us(lo) / F.lit(step_us)) * F.lit(step_us)
        ).cast("long")
        hi_us = (
            F.floor(epoch_us(hi) / F.lit(step_us)) * F.lit(step_us)
        ).cast("long")
        base = g.select(*keys).distinct() if keys else g.select().limit(1)
        grid = base.select(
            *keys,
            F.explode(F.sequence(lo_us, hi_us, F.lit(step_us))).alias(_GF_US),
        )
    else:
        ext = g.groupBy(*keys).agg(
            F.min(_GF_US).alias("__lo"), F.max(_GF_US).alias("__hi")
        )
        grid = ext.select(
            *keys,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_us))
            ).alias(_GF_US),
        )

    out = grid.join(g, keys + [_GF_US], "left")
    filled_cols: Dict[str, Column] = {}
    w_locf = (
        Window.partitionBy(*keys)
        .orderBy(_GF_US)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name, policy in fill.items():
        c = F.col(name)
        if policy == "locf":
            filled_cols[name] = F.last(name, ignorenulls=True).over(w_locf)
        elif policy == "zero":
            filled_cols[name] = F.coalesce(c, F.lit(0))
        elif isinstance(policy, tuple) and policy[0] == "const":
            filled_cols[name] = F.coalesce(c, F.lit(policy[1]))
        else:
            raise ValueError(f"unknown fill policy for {name}: {policy!r}")
    for name, c in filled_cols.items():
        out = out.withColumn(name, c)
    return out.select(
        *keys,
        F.timestamp_micros(F.col(_GF_US)).alias(ts),
        *[F.col(n) for n in aggs],
        F.coalesce(~F.col(_GF_PRESENT), F.lit(True)).alias("gap_filled"),
    )


def scd2_build(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Optional[Sequence[str]] = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: collapse a
    change stream (one row per observed state of a key) into
    versioned validity intervals — the classic warehouse LOAD pattern
    completing the reference's load family (its W4 batched upsert is
    type 1 overwrite-in-place; this is the keep-history sibling).

    Output: one row per retained version of each key —
    (key_cols..., attr_cols..., valid_from, valid_to, is_current,
    version). `valid_to` is the NEXT version's `valid_from` (NULL for
    the open/current version); `version` numbers 1..n per key in time
    order. With `collapse_unchanged` (default), an update whose
    attrs are null-safe-equal to the previous version is dropped
    BEFORE intervals are cut, so back-to-back identical states merge
    into one interval — the standard SCD2 "only real changes
    version" rule.

    Determinism: ties on `ts_col` are broken by `order_cols`
    (REQUIRED if the stream can carry same-timestamp updates for one
    key — without it lag/lead order is nondeterministic).

    Scale shape: exactly ONE shuffle, keyed by `key_cols`; both the
    change-collapse (lag) and the interval cut (lead) are
    partition-local window passes over the same sort, which Catalyst
    plans as a single Window block on one Exchange. No joins, no
    driver state; skew only if one dimension key carries a huge
    change history (not a realistic SCD shape).
    """
    reject_reserved("scd2_build", ["__scd_chg"], df=df)
    keys = _keys(key_cols)
    attrs = list(attr_cols)
    order = [ts_col, *(order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    out = df
    if collapse_unchanged:
        state = F.struct(*[F.col(c) for c in attrs])
        changed = ~state.eqNullSafe(F.lag(state).over(w))
        # the first row per key has a NULL lag -> eqNullSafe is false
        # against a non-null state -> changed is true; a key whose
        # first state is ALL-NULL attrs still versions correctly
        # because lag(struct) of the first row is null while the
        # struct itself is non-null (struct of nulls != null).
        out = out.withColumn("__scd_chg", changed).where(
            F.col("__scd_chg")
        ).drop("__scd_chg")
    w2 = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return (
        out.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w2).cast("int"))
        .select(
            *keys,
            *attrs,
            "valid_from",
            "valid_to",
            "is_current",
            "version",
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Union[str, Sequence[str]],
    compare_cols: Optional[Sequence[str]] = None,
    *,
    change_col: str = "change_type",
    keep_unchanged: bool = False,
) -> DataFrame:
    """Keyed changeset between two snapshots of the same table: which
    rows were inserted, deleted, or updated between `old` and `new` —
    the change-data-capture primitive that feeds `scd2_build` (history
    keep) and the reference's W4 batched upsert (type-1 apply): diff
    two full loads once, then apply/version only the changes.

    Output: one row per key present in either snapshot (unchanged keys
    dropped unless `keep_unchanged`) —
    (key_cols..., change_type, old_<c>, new_<c> for each compare col).
    `change_type` ∈ {'insert', 'delete', 'update'} (+ 'unchanged').
    Comparison is null-safe on the struct of `compare_cols` (default:
    all non-key columns the two snapshots share, in `old`'s column
    order), so NULL→NULL is unchanged and NULL→value is an update.

    Scale shape: exactly ONE shuffle — a full-outer sort-merge join
    keyed by `key_cols`; the struct compare and the change tag are
    narrow row-local expressions on the joined row, and the
    unchanged-key drop happens before anything else reads the result.
    At 100 TB, snapshots written bucketed by the key
    (`sinks.writers.write_bucketed`) make the join exchange-free on
    both sides; AQE skew-split covers hot keys otherwise. Never
    materializes old×new pairs, never collects.
    """
    keys = _keys(key_cols)
    if compare_cols is None:
        shared = set(new.columns)
        compare_cols = [
            c for c in old.columns if c not in keys and c in shared
        ]
    cmp_cols = list(compare_cols)
    if not cmp_cols:
        raise ValueError("snapshot_diff: no compare columns")
    reject_reserved(
        "snapshot_diff", ["__sd_in_old", "__sd_in_new"], old=old, new=new
    )
    for side_name, side in (("old", old), ("new", new)):
        missing = [c for c in [*keys, *cmp_cols] if c not in side.columns]
        if missing:
            raise ValueError(
                f"snapshot_diff: {side_name} snapshot lacks {missing}"
            )

    # Tag key presence per side BEFORE the join: a NULL key value in
    # the data would otherwise be indistinguishable from "row absent".
    o = old.select(
        *keys,
        F.lit(True).alias("__sd_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cmp_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__sd_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cmp_cols],
    )
    j = o.join(n, on=keys, how="full_outer")
    old_state = F.struct(*[F.col(f"old_{c}") for c in cmp_cols])
    new_state = F.struct(*[F.col(f"new_{c}") for c in cmp_cols])
    tag = (
        F.when(F.col("__sd_in_old").isNull(), F.lit("insert"))
        .when(F.col("__sd_in_new").isNull(), F.lit("delete"))
        .when(~old_state.eqNullSafe(new_state), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn(change_col, tag)
    if not keep_unchanged:
        out = out.where(F.col(change_col) != "unchanged")
    return out.select(
        *keys,
        change_col,
        *[f"old_{c}" for c in cmp_cols],
        *[f"new_{c}" for c in cmp_cols],
    )
