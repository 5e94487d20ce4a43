"""Temporal joins: as-of (point-in-time) join and binned range join.

The 2010 reference has no temporal-join surface; these are Spark-first
formulations of the two canonical event-pipeline joins that Spark SQL
itself lacks as primitives (an inequality join falls back to
BroadcastNestedLoopJoin, which is O(n*m) and unusable at scale).

``asof_join`` — single-shuffle union+window formulation. Both sides are
tagged and unioned, hash-partitioned once by the join key, sorted within
partitions by ``(ts, side)``, and the most recent right-side payload is
carried forward with ``last(..., ignorenulls=True)``. Cost is one
Exchange plus an in-partition sort — no per-row probe, no range
explosion, no second shuffle. This is the formulation you want at
100 TB: it scales with the sort, not with the candidate-pair count.
Skew caveat: all rows of one key sort in one task (same as any keyed
window — sessionize has the identical profile); a monster key would need
time-sliced pre-bucketing with boundary overlap, which is out of scope
and noted here deliberately.

``range_join_count`` — binned range join. Timestamps are bucketed at
the window width, the probe side expands to the (fixed, two) covering
buckets, the join runs as a plain equi-join on ``(key, bucket)`` that
Catalyst plans as a hash join, and an exact residual predicate filters
the in-window matches. Equivalent results to the naive inequality join
at hash-join cost; the 2x probe fan-out is the entire overhead.

Timestamp precision note: the test parquet stores ns timestamps which
Spark rounds to us. Comparisons here are therefore exact only for
events more than 2 us apart — trivially true for real event streams and
verified for the synthetic ones (no sub-us spacing at any SF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join_count"]

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    payload: Sequence[str] = ("event_id", "value"),
    prefix: str = "prev_",
    allow_exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the payload of the most recent right
    row with the same key and ``right.ts <= left.ts`` (backward as-of;
    strict ``<`` when ``allow_exact_matches=False``). Left rows with no
    prior right row keep null payload (left-outer semantics).
    ``direction="forward"`` flips the search to the EARLIEST right row
    at-or-after the left timestamp — the same single-shuffle plan with
    the sort reversed.

    Matches ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``
    (DuckDB/pandas ``merge_asof`` semantics; forward matches
    merge_asof(direction='forward')). Deterministic whenever
    ``(key, ts)`` is unique on the right side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    on = list(on)
    pay = list(payload)
    out_names = {f"{prefix}{c}" for c in pay}
    overlap = (set(pay) | set(left.columns)) & out_names
    if overlap:
        raise ValueError(
            f"as-of output column(s) would collide: {sorted(overlap)} — "
            "pick a different prefix"
        )
    internal = {f"__r_{c}" for c in pay} | {_SIDE}
    dirty = internal & set(left.columns)
    if dirty:
        raise ValueError(f"left side uses reserved column name(s): {sorted(dirty)}")

    # right side reduced to key + ts + tagged payload; left keeps its
    # full row. unionByName null-fills each side's missing columns.
    r = right.select(
        *on,
        F.col(ts).alias(ts),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in pay],
    )
    l = left.withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # at equal ts the right row sorts first (side 0 < 1) so it is
    # visible to the left row — i.e. <= semantics; flip for strict <.
    # forward direction = identical walk over time reversed: sort ts
    # desc and "last right seen" becomes "earliest right at-or-after".
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in pay
        ],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(
        _SIDE, *[f"__r_{c}" for c in pay]
    )


def _micros(col: Column) -> Column:
    # parquet ntz timestamps need the cast; the session-tz shift it
    # introduces is identical on both sides, so windows and buckets
    # stay aligned.
    return F.unix_micros(col.cast("timestamp"))


def _bucket(col: Column, width_us: int) -> Column:
    return F.floor(_micros(col) / F.lit(width_us))


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_id: str,
    ts: str = "ts",
    window_sec: int = 1800,
    value: str | None = None,
) -> DataFrame:
    """Per left row: count (and optionally sum ``value`` over) the right
    rows with the same key inside the half-open window
    ``(left.ts - window_sec, left.ts]``.

    Returns ``(left_id, *on, n_in_window[, sum_value])`` with one row
    per left row (zero-count rows included — left-outer semantics).
    ``left_id`` must identify left rows uniquely — duplicate ids merge
    into one output row with combined counts.

    The bucket width equals the window length, so any window spans at
    most two buckets and the probe side fans out exactly 2x; a
    (left, right) pair can only meet in the right row's single home
    bucket, so no dedup step is needed.
    """
    on = list(on)
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    width_us = int(window_sec) * 1_000_000
    lb = left.select(
        left_id,
        *on,
        _micros(F.col(ts)).alias("__lus"),
        _bucket(F.col(ts), width_us).alias("__b"),
    )
    probes = lb.select(
        left_id,
        *on,
        "__lus",
        F.explode(F.array(F.col("__b") - 1, F.col("__b"))).alias("__pb"),
    )
    rb = right.select(
        *on,
        _micros(F.col(ts)).alias("__rus"),
        _bucket(F.col(ts), width_us).alias("__pb"),
        *( [F.col(value).alias("__rval")] if value else [] ),
    )
    j = probes.join(rb, on=on + ["__pb"], how="left")
    in_win = (F.col("__rus") > F.col("__lus") - F.lit(width_us)) & (
        F.col("__rus") <= F.col("__lus")
    )
    hit = F.when(in_win, F.lit(1)).otherwise(F.lit(0))
    aggs = [F.sum(hit).alias("n_in_window")]
    if value:
        aggs.append(
            F.sum(F.when(in_win, F.col("__rval")).otherwise(F.lit(0.0))).alias(
                "sum_value"
            )
        )
    return j.groupBy(left_id, *on).agg(*aggs)
