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

__all__ = [
    "asof_join",
    "range_join_count",
    "gap_fill",
    "scd2_intervals",
    "rolling_aggregate",
    "time_weighted_average",
    "interval_overlap_count",
    "anomaly_zscore",
    "trend_fit",
    "m4_downsample",
    "anomaly_zscore_binned",
    "cusum_changepoints",
    "seasonal_baseline",
    "interarrival_stats",
    "last_touch_attribution",
    "anomaly_mad",
    "slo_burn_rate",
]

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


def gap_fill(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    step_sec: int = 3600,
) -> DataFrame:
    """Regularize an irregular per-key time series onto an epoch-aligned
    grid and forward-fill the gaps (the time-series resample +
    locf/gap-fill primitive; no backfill — leading gaps stay null).

    Per key: bucket every observation to ``floor(ts / step)``, aggregate
    each bucket to ``(n_obs, avg value)``, generate the dense bucket
    spine from the key's first to last bucket IN-ROW (sequence + explode
    — never a driver-side loop or a cross join against a global
    calendar), left-join observations, and carry the last seen value
    forward with ``last(ignorenulls=True)``. Returns
    ``(*on, bucket_ts, n_obs, value, is_gap)``.

    Scale: every exchange is on the key (bucket agg on (key, bucket) is
    the finest) — spine size is bounded by the key's own time extent, so
    a 100x-longer corpus grows the spine linearly with per-key span, not
    with corpus size. Skew profile matches any keyed window.
    """
    on = list(on)
    if step_sec <= 0:
        raise ValueError(f"step_sec must be positive, got {step_sec}")
    width_us = int(step_sec) * 1_000_000
    obs = (
        df.select(*on, _bucket(F.col(ts), width_us).alias("__b"), F.col(value))
        .groupBy(*on, "__b")
        .agg(F.count(F.lit(1)).alias("n_obs"), F.avg(value).alias("__v"))
    )
    spine = (
        obs.groupBy(*on)
        .agg(F.min("__b").alias("__b0"), F.max("__b").alias("__b1"))
        .select(*on, F.explode(F.sequence("__b0", "__b1")).alias("__b"))
    )
    joined = spine.join(obs, on + ["__b"], "left")
    w = (
        Window.partitionBy(*on)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *on,
        F.timestamp_micros(F.col("__b") * width_us).alias("bucket_ts"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        F.last("__v", ignorenulls=True).over(w).alias(value),
        F.col("__v").isNull().alias("is_gap"),
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    attrs: Sequence[str] = ("value",),
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    stream: consecutive rows whose tracked ``attrs`` are unchanged
    collapse into one validity interval ``[valid_from, valid_to)``, the
    open current row gets ``valid_to = NULL`` + ``is_current``, and
    ``version`` numbers a key's intervals from 1.

    One exchange (the key window); change detection is lag-compare over
    (key, ts), interval close is lead over the surviving change rows —
    the standard warehouse SCD2 build as two stacked windows on ONE
    partitioning. Requires unique (key, ts); NULL attr values compare
    via null-safe equality (a NULL→value transition IS a change).
    """
    attrs = list(attrs)
    if not attrs:
        raise ValueError("scd2_intervals needs at least one tracked attribute")
    w = Window.partitionBy(key).orderBy(ts)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.lag(ts).over(w).isNull()
    marked = df.select(key, ts, *attrs).withColumn(
        "__chg", first | changed
    )
    changes = marked.filter(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(key).orderBy(ts)
    return changes.select(
        key,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def rolling_aggregate(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    window_sec: int = 3600,
) -> DataFrame:
    """Trailing time-window aggregates per row: for every event, the
    count / sum / mean of the same key's values inside
    ``[ts - window_sec, ts]`` (inclusive both ends — the event itself
    always counts). The time-series moving-average primitive as ONE
    RANGE-frame window over microsecond ordering: one exchange on the
    key, no self-join, no probe fan-out (contrast range_join_count,
    which joins two different streams). Adds
    (rolling_n, rolling_sum, rolling_avg)."""
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    width_us = int(window_sec) * 1_000_000
    w = (
        Window.partitionBy(*on)
        .orderBy(_micros(F.col(ts)))
        .rangeBetween(-width_us, 0)
    )
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("rolling_n"),
        F.sum(F.col(value)).over(w).alias("rolling_sum"),
        F.avg(F.col(value)).over(w).alias("rolling_avg"),
    )


def time_weighted_average(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-key time-weighted average over irregular samples (the
    hypertable ``time_weight('locf')`` analog): each sample's value
    holds until the next sample, so it is weighted by the microsecond
    gap to its successor; the last sample carries no weight. Keys whose
    samples all share one timestamp (zero total span) fall back to the
    plain mean.

    ONE lead() window plus ONE groupBy on the same key — the window's
    hash partitioning is reused by the aggregate, so the whole operator
    costs a single exchange at any scale. Weights are integer
    microseconds, so the only FP work is the final products/ratio;
    relative error is n*eps of the dot product, far inside a 6 dp
    round.

    Returns ``(*on, n_samples, span_us, twa)``.
    """
    on = list(on)
    w = Window.partitionBy(*on).orderBy(_micros(F.col(ts)))
    gapped = df.select(
        *on,
        F.col(value).alias("__v"),
        (F.lead(_micros(F.col(ts))).over(w) - _micros(F.col(ts))).alias("__w"),
    )
    span = F.sum("__w")
    return gapped.groupBy(*on).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.coalesce(span, F.lit(0)).cast("long").alias("span_us"),
        F.when(
            span.isNull() | (span == 0), F.avg("__v")
        ).otherwise(
            F.sum(F.col("__v") * F.col("__w")) / span
        ).alias("twa"),
    )


def interval_overlap_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_id: str,
    right_id: str,
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_sec: int = 1800,
) -> DataFrame:
    """Per left interval: how many right intervals with the same key
    overlap it (``l.start <= r.end AND r.start <= l.end``, both ends
    inclusive). Interval-interval overlap is the two-sided sibling of
    ``range_join_count`` (point-in-window) and falls back to an
    O(n*m) BroadcastNestedLoopJoin if written as a raw inequality join.

    Bucketed equi-join formulation: each interval explodes to the time
    buckets it covers (``ceil(len/W)+1`` rows — bounded fan-out), pairs
    meet in any shared bucket via a plain hash join on ``(key,
    bucket)``, an exact residual keeps true overlaps, and
    ``count(DISTINCT right_id)`` collapses pairs that met in more than
    one shared bucket. Lossless: two intervals overlap iff some instant
    lies in both, and that instant's bucket is covered by both sides.

    Returns ``(left_id, *on, n_overlaps)`` with one row per left
    interval (zero-overlap rows kept — left-outer semantics).
    """
    on = list(on)
    if bucket_sec <= 0:
        raise ValueError(f"bucket_sec must be positive, got {bucket_sec}")
    if left_id == right_id:
        # the generated __<id>_s/__<id>_e scratch columns collide
        raise ValueError(
            f"left_id and right_id must differ, both are {left_id!r}"
        )
    width_us = int(bucket_sec) * 1_000_000

    def covered(df: DataFrame, id_col: str, a: str, b: str) -> DataFrame:
        s_us = _micros(F.col(a))
        e_us = _micros(F.col(b))
        # An inverted interval would feed sequence() a descending range
        # and silently fabricate candidate buckets — fail loudly instead.
        e_checked = F.when(
            e_us < s_us,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_overlap_count: {b} < {a} for {id_col}="
                    ),
                    F.col(id_col).cast("string"),
                )
            ).cast("long"),
        ).otherwise(e_us)
        return df.select(
            id_col,
            *on,
            s_us.alias(f"__{id_col}_s"),
            e_checked.alias(f"__{id_col}_e"),
        ).withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"__{id_col}_s") / width_us),
                    F.floor(F.col(f"__{id_col}_e") / width_us),
                )
            ),
        )

    lb = covered(left, left_id, start, end)
    rb = covered(right, right_id, start, end)
    j = lb.join(rb, on=on + ["__bkt"], how="left")
    overlap = (F.col(f"__{left_id}_s") <= F.col(f"__{right_id}_e")) & (
        F.col(f"__{right_id}_s") <= F.col(f"__{left_id}_e")
    )
    hit = F.when(overlap, F.col(right_id))
    return j.groupBy(left_id, *on).agg(
        F.count_distinct(hit).alias("n_overlaps")
    )


def anomaly_zscore(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    window_sec: int = 21600,
    z_threshold: float = 3.0,
    min_samples: int = 5,
) -> DataFrame:
    """Rolling z-score anomaly flags: for every row, mean and sample
    stddev of the same key's trailing ``window_sec`` values (current row
    included), then ``z = (x - mean) / std``. Rows in windows with fewer
    than ``min_samples`` points or ~zero variance get a null z (cold
    start / constant signal — not enough evidence to call an anomaly).

    ONE RANGE-frame window over microsecond ordering computes all three
    statistics — no self-join, single exchange on the key, identical
    scale profile to ``rolling_aggregate``. The flag compares a
    4 dp-rounded z so a cross-engine last-ulp stddev difference cannot
    flip it at the threshold boundary.

    Adds ``(rolling_mean, rolling_std, zscore, is_anomaly)``.
    """
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    if min_samples < 2:
        raise ValueError(f"min_samples must be >= 2, got {min_samples}")
    width_us = int(window_sec) * 1_000_000
    w = (
        Window.partitionBy(*on)
        .orderBy(_micros(F.col(ts)))
        .rangeBetween(-width_us, 0)
    )
    # Two stages on purpose: the window aggregates materialize ONCE,
    # then z / the flag derive from the materialized columns. Inlining
    # the window expressions into z (and into abs(z) for the flag)
    # multiplies the per-row frame re-aggregation — Spark does not
    # dedup structurally-equal bounded-frame window functions — which a
    # hot key turns from 38 s into 20+ min at the 2M-row skew probe.
    base = df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.avg(F.col(value)).over(w).alias("rolling_mean"),
        F.stddev_samp(F.col(value)).over(w).alias("__std"),
    )
    n, std = F.col("__n"), F.col("__std")
    z = F.when(
        (n >= min_samples) & (std > 1e-12),
        F.round((F.col(value) - F.col("rolling_mean")) / std, 4),
    )
    # Spark's stddev_samp yields NaN on a 1-row frame (0/0) where SQL
    # engines yield NULL — gate to the SQL convention.
    return (
        base.withColumn("rolling_std", F.when(n >= 2, std))
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.abs(F.col("zscore")) > F.lit(float(z_threshold)),
        )
        .drop("__n", "__std")
    )


def trend_fit(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-key ordinary-least-squares trend of value over time: slope
    (per day), intercept (at the epoch), and R² from the built-in
    regression aggregates — ONE partial-agg groupBy, no window, no
    collect; the metric-drift detector for event streams. Time enters
    as fractional days since the epoch so slopes are human-scaled and
    the x² sums stay far from double overflow. Keys with a single
    sample (or zero time variance) return null slope/intercept/r2, the
    SQL regression convention. Returns
    ``(*on, n_samples, slope_per_day, intercept, r2)``."""
    x = _micros(F.col(ts)) / F.lit(86_400_000_000.0)
    y = F.col(value).cast("double")
    return df.groupBy(*on).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.regr_slope(y, x).alias("slope_per_day"),
        F.regr_intercept(y, x).alias("intercept"),
        F.regr_r2(y, x).alias("r2"),
    )


def m4_downsample(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    bucket_sec: int = 86400,
) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., PVLDB 2014 —
    public): per key and time bucket, keep exactly the four values a
    pixel column can show — first, last, min, max — which reproduces
    the line chart of the full series at that resolution with a
    constant per-bucket output. ONE partial-agg groupBy (min_by/max_by
    pick the endpoints), no window, no sort of the raw series; the
    100 TB dashboard query.

    Returns ``(*on, bucket_start_us, n_points, v_first, v_last,
    v_min, v_max)``."""
    if bucket_sec <= 0:
        raise ValueError(f"bucket_sec must be positive, got {bucket_sec}")
    width_us = int(bucket_sec) * 1_000_000
    us = _micros(F.col(ts))
    v = F.col(value).cast("double")
    return (
        df.select(
            *on,
            (F.floor(us / width_us) * width_us).alias("bucket_start_us"),
            us.alias("__us"),
            v.alias("__v"),
        )
        .groupBy(*on, "bucket_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min_by("__v", "__us").alias("v_first"),
            F.max_by("__v", "__us").alias("v_last"),
            F.min("__v").alias("v_min"),
            F.max("__v").alias("v_max"),
        )
    )


def anomaly_zscore_binned(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    window_sec: int = 21600,
    z_threshold: float = 3.0,
    min_samples: int = 5,
) -> DataFrame:
    """The monster-key escape hatch for ``anomaly_zscore``: identical
    semantics (same trailing inclusive window, same gates, same
    4 dp-rounded z), but the trailing-window statistics come from the
    binned two-bucket equi-join instead of a RANGE-frame window.

    Why it exists: Spark re-aggregates a bounded frame per row INSIDE
    ONE TASK per key, so a hot key pays O(rows_in_key * frame) serially
    — measured 760 s for a 600k-row key at the 2M-row skew probe, vs
    seconds here. The join formulation computes n / sum / sum-of-
    squares per row as O(candidate pairs) work spread across
    (key, bucket) partitions; candidate pairs = rows x occupancy of two
    buckets, the same total work, but parallel. Prefer the window form
    for well-distributed keys (no 2x probe fan-out, no join); switch
    here when a key can hold millions of rows.

    std uses the textbook (sum_sq - n*mean^2)/(n-1) form — equal to
    stddev_samp within FP noise, which the 4 dp z rounding absorbs (the
    equality is pytest-pinned against the window operator)."""
    on = list(on)
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    if min_samples < 2:
        raise ValueError(f"min_samples must be >= 2, got {min_samples}")
    width_us = int(window_sec) * 1_000_000
    us = _micros(F.col(ts))
    # Unique per-row key BEFORE the probe fan-out: grouping the join
    # back together on this key (not on every input column) preserves
    # exact-duplicate rows as distinct outputs — identical semantics to
    # the window operator — and tolerates non-groupable column types
    # (maps) in the frame.
    left = df.select(
        "*",
        us.alias("__lus"),
        F.floor(us / width_us).alias("__b"),
    ).withColumn("__rowid", F.monotonically_increasing_id())
    probes = left.withColumn(
        "__pb", F.explode(F.array(F.col("__b") - 1, F.col("__b")))
    ).drop("__b")
    right = df.select(
        *on,
        us.alias("__rus"),
        F.floor(us / width_us).alias("__pb"),
        F.col(value).cast("double").alias("__rv"),
    )
    j = probes.join(right, on=on + ["__pb"], how="left")
    # inclusive [ts - window, ts] — the window operator's frame
    in_win = (F.col("__rus") >= F.col("__lus") - F.lit(width_us)) & (
        F.col("__rus") <= F.col("__lus")
    )
    hit = F.when(in_win, F.col("__rv"))
    # Left-side columns are constant within a __rowid group, so FIRST
    # is deterministic; it also carries types groupBy keys can't (map).
    carry = [c for c in probes.columns if c not in ("__pb", "__rowid")]
    agg = j.groupBy("__rowid").agg(
        *[F.first(c).alias(c) for c in carry],
        F.count(hit).alias("__n"),
        F.sum(hit).alias("__s"),
        F.sum(hit * hit).alias("__s2"),
    )
    n, s, s2 = F.col("__n"), F.col("__s"), F.col("__s2")
    mean = s / n
    var = F.greatest((s2 - n * mean * mean) / (n - 1), F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (n >= min_samples) & (std > 1e-12),
        F.round((F.col(value).cast("double") - mean) / std, 4),
    )
    return (
        agg.withColumn("rolling_mean", mean)
        .withColumn("rolling_std", F.when(n >= 2, std))
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly", F.abs(F.col("zscore")) > F.lit(float(z_threshold))
        )
        .drop("__n", "__s", "__s2", "__lus", "__rowid")
    )


def cusum_changepoints(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    k: float = 0.5,
    h: float = 5.0,
    target: float | None = None,
    scale: float | None = None,
) -> DataFrame:
    """CUSUM mean-shift detection (Page 1954, public): per key, the
    standardized deviations accumulate into S+ = max(0, S+ + x' - k)
    and S- = min(0, S- + x' + k); crossing ±h raises a change point
    (direction 'up'/'down') and resets both sums. ``k`` is the
    slack (in sigmas) and ``h`` the decision threshold — the classic
    (0.5, 5) detects ~1-sigma shifts with ~low false-positive rate.

    ``target``/``scale`` default to each key's OWN mean/stddev (one
    extra aggregate pass, broadcast back) — fine for retrospective
    analysis; pass explicit values for the online-monitoring semantics
    (and for stream==batch equality with ``streaming.cusum_stream``).

    CUSUM is inherently sequential per key, so this runs as an
    Arrow-batched ``applyInPandas`` scan over each key's time-ordered
    rows — the keyed-sequential class shared with the stateful
    streaming operators (one key's stream must fit one task; that is
    the algorithm, not the implementation). Returns
    ``(*on, ts, direction, statistic)`` — one row per change point.
    """
    import numpy as np
    import pandas as pd

    on = list(on)
    if h <= 0 or k < 0:
        raise ValueError(f"need h > 0 and k >= 0, got h={h}, k={k}")
    if (target is None) != (scale is None):
        raise ValueError("pass both target and scale, or neither")
    work = df.select(*on, F.col(ts).alias("__ts"), F.col(value).cast("double").alias("__v"))
    if target is None:
        stats = work.groupBy(*on).agg(
            F.avg("__v").alias("__mu"), F.stddev_samp("__v").alias("__sd")
        )
        work = work.join(F.broadcast(stats), on)
    else:
        work = work.withColumn("__mu", F.lit(float(target))).withColumn(
            "__sd", F.lit(float(scale))
        )
    out_fields = ", ".join(
        [f"`{c}` {t}" for c, t in df.select(*on).dtypes]
        + [f"__ts {dict(df.dtypes)[ts]}", "direction string", "statistic double"]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ts")
        sd = pdf["__sd"].iloc[0]
        mu = pdf["__mu"].iloc[0]
        rows = []
        if sd is None or not np.isfinite(sd) or sd <= 0:
            return pd.DataFrame(rows, columns=list(pdf.columns[: len(on)]) + ["__ts", "direction", "statistic"])
        sp = sn = 0.0
        keyvals = [pdf[c].iloc[0] for c in pdf.columns[: len(on)]]
        for _, r in pdf.iterrows():
            x = (r["__v"] - mu) / sd
            sp = max(0.0, sp + x - k)
            sn = min(0.0, sn + x + k)
            if sp > h:
                rows.append(keyvals + [r["__ts"], "up", sp])
                sp = sn = 0.0
            elif sn < -h:
                rows.append(keyvals + [r["__ts"], "down", sn])
                sp = sn = 0.0
        return pd.DataFrame(rows, columns=list(pdf.columns[: len(on)]) + ["__ts", "direction", "statistic"])

    res = work.groupBy(*on).applyInPandas(scan, out_fields)
    return res.withColumnRenamed("__ts", ts)


def seasonal_baseline(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value: str = "value",
    period: str = "hour_of_day",
) -> DataFrame:
    """Seasonality profile + residual: each row gets its key's mean for
    the row's seasonal slot (hour-of-day, day-of-week, or day-of-month)
    and the deviation from it — the de-seasonalization step in front of
    threshold/z-score alerting (a 9am spike is only a spike relative to
    9am's baseline). One profile aggregate broadcast back onto the rows
    — the iqr/winsorize two-pass shape. Adds
    ``(season_slot, seasonal_mean, residual)``."""
    slots = {
        "hour_of_day": F.hour(F.col(ts)),
        "day_of_week": F.dayofweek(F.col(ts)),
        "day_of_month": F.dayofmonth(F.col(ts)),
    }
    if period not in slots:
        raise ValueError(f"period must be one of {sorted(slots)}, got {period}")
    on = list(on)
    slot = slots[period].alias("season_slot")
    v = F.col(value).cast("double")
    work = df.withColumn("season_slot", slot)
    prof = work.groupBy(*on, "season_slot").agg(
        F.avg(v).alias("seasonal_mean")
    )
    return work.join(F.broadcast(prof), on + ["season_slot"]).withColumn(
        "residual", v - F.col("seasonal_mean")
    )


def interarrival_stats(
    df: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
) -> DataFrame:
    """Inter-arrival characterization per key: mean/stddev/CV of the
    gaps between consecutive events plus the burstiness index
    ``B = (sigma - mu) / (sigma + mu)`` (Goh & Barabási, public):
    -1 = perfectly periodic, 0 = Poisson, -> 1 = extreme bursts. The
    stream-shape diagnostic behind watermark and session-gap tuning.
    One lag() window + one groupBy sharing the key exchange (the
    time_weighted_average shape). Keys with < 2 events return nulls.
    Returns ``(*on, n_gaps, mean_gap_sec, std_gap_sec, cv, burstiness)``."""
    on = list(on)
    w = Window.partitionBy(*on).orderBy(_micros(F.col(ts)))
    gap = (
        (_micros(F.col(ts)) - F.lag(_micros(F.col(ts))).over(w)) / 1e6
    ).alias("__gap")
    gapped = df.select(*on, gap)
    mu = F.avg("__gap")
    sd = F.stddev_samp("__gap")
    return gapped.groupBy(*on).agg(
        F.count("__gap").alias("n_gaps"),
        mu.alias("mean_gap_sec"),
        F.when(F.count("__gap") >= 2, sd).alias("std_gap_sec"),
        F.when((F.count("__gap") >= 2) & (mu > 0), sd / mu).alias("cv"),
        F.when(
            (F.count("__gap") >= 2) & ((sd + mu) > 0), (sd - mu) / (sd + mu)
        ).alias("burstiness"),
    )


def last_touch_attribution(
    df: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    lookback_sec: int,
    on: Sequence[str] = ("user_id",),
    ts: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch marketing attribution — for every conversion event,
    the most recent touch event of the same key within the lookback
    window (the single-touch model every attribution system ships
    first; multi-touch models start from this same carried-touch
    scan). Returns one row per conversion: ``(*on, conversion_id,
    conversion_ts, touch_event_id, touch_type, touch_ts,
    seconds_since_touch, attributed)`` — touch columns NULL (and
    ``attributed`` false) when no touch precedes the conversion inside
    the window.

    Semantics: a touch at the SAME timestamp as the conversion is
    attributable (ties order touches before conversions); among
    same-timestamp touches the highest ``id_col`` wins — the total
    (ts, kind, id) order makes the result deterministic. The age test
    is on exact microsecond arithmetic (``seconds_since_touch`` is
    micros/1e6, 6-dp nudge-rounded for display AFTER the decision is
    made on integer micros).

    Scale shape: ONE window exchange keyed on ``on`` — the union-tag +
    carry-forward pattern asof_join uses, expressed as three
    last(ignorenulls) calls sharing a single window frame; then a
    conversion filter. No join, no per-key collect; skewed power-users
    concentrate one key per reducer, the same trade as any
    user-keyed sessionization (AQE skew handling applies)."""
    if lookback_sec <= 0:
        raise ValueError(f"lookback_sec must be positive, got {lookback_sec}")
    tt = list(touch_types)
    if not tt:
        raise ValueError("last_touch_attribution needs at least one touch type")
    on = list(on)
    base = df.filter(
        F.col(type_col).isin(*tt) | (F.col(type_col) == conversion_type)
    ).select(
        *on,
        _micros(F.col(ts)).alias("__us"),
        F.col(ts).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__type"),
        (F.col(type_col) == conversion_type).cast("int").alias("__isc"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__us").asc(), F.col("__isc").asc(), F.col("__id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("__isc") == 0
    carried = base.select(
        *on,
        "__us",
        "__ts",
        "__id",
        "__isc",
        F.last(F.when(is_touch, F.col("__id")), ignorenulls=True)
        .over(w)
        .alias("__tid"),
        F.last(F.when(is_touch, F.col("__type")), ignorenulls=True)
        .over(w)
        .alias("__ttype"),
        F.last(F.when(is_touch, F.col("__us")), ignorenulls=True)
        .over(w)
        .alias("__tus"),
        F.last(F.when(is_touch, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__tts"),
    )
    in_window = F.col("__tus").isNotNull() & (
        F.col("__us") - F.col("__tus") <= F.lit(int(lookback_sec) * 1_000_000)
    )
    return carried.filter(F.col("__isc") == 1).select(
        *on,
        F.col("__id").alias("conversion_id"),
        F.col("__ts").alias("conversion_ts"),
        F.when(in_window, F.col("__tid")).alias("touch_event_id"),
        F.when(in_window, F.col("__ttype")).alias("touch_type"),
        F.when(in_window, F.col("__tts")).alias("touch_ts"),
        F.round(
            F.when(
                in_window,
                (F.col("__us") - F.col("__tus")).cast("double") / F.lit(1e6),
            )
            + F.lit(1e-12),
            6,
        ).alias("seconds_since_touch"),
        F.coalesce(in_window, F.lit(False)).alias("attributed"),
    )


def anomaly_mad(
    df: DataFrame,
    on: Sequence[str],
    value: str = "value",
    threshold: float = 3.5,
    id_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Robust outlier flags via the median absolute deviation — the
    Iglewicz-Hoaglin modified z-score M = 0.6745·(x − med)/MAD, the
    companion ``anomaly_zscore`` needs when the signal itself contains
    the outliers being hunted (mean/stddev are dragged by the very
    points they should flag; median/MAD have a 50% breakdown point).
    Per key group: the exact interpolated median of ``value``, the MAD
    (median of |x − med|), then per row ``mod_z`` (6-dp nudge-rounded)
    and ``is_outlier`` = |mod_z| > threshold — the flag derives from
    the ROUNDED column, and both medians are nudge-rounded to the 6-dp
    grid before re-entering arithmetic, so every decision replays
    bit-exactly in SQL. mod_z is NULL (flag false) for zero-MAD groups
    (a constant signal offers no evidence).

    Returns (*id_cols, *on, value, med, mad, mod_z, is_outlier).

    Scale shape: two keyed aggregations (median, then MAD over the
    deviations) + two equi-joins back on the key — the stats tables
    are group-sized and broadcast when the key is low-cardinality.
    ``F.percentile`` is the exact interpolated form (per-group memory
    is the usual exact-percentile trade — swap percentile_approx at
    true scale; exact is what the oracle replays, the
    profile_quantile_bins convention)."""
    on = list(on)
    if not on:
        raise ValueError("anomaly_mad needs at least one key column")
    ids = list(id_cols)
    med_t = df.groupBy(*on).agg(
        F.round(F.percentile(F.col(value), F.lit(0.5)) + F.lit(1e-12), 6).alias(
            "med"
        )
    )
    dev = df.select(*ids, *on, F.col(value)).join(med_t, on).withColumn(
        "__dev", F.round(F.abs(F.col(value) - F.col("med")) + F.lit(1e-12), 6)
    )
    mad_t = dev.groupBy(*on).agg(
        F.round(F.percentile(F.col("__dev"), F.lit(0.5)) + F.lit(1e-12), 6).alias(
            "mad"
        )
    )
    mz = F.round(
        F.when(
            F.col("mad") > 0,
            F.lit(0.6745) * (F.col(value) - F.col("med")) / F.col("mad"),
        )
        + F.lit(1e-12),
        6,
    )
    return (
        dev.join(mad_t, on)
        .withColumn("mod_z", mz)
        .withColumn(
            "is_outlier",
            F.coalesce(
                F.abs(F.col("mod_z")) > F.lit(float(threshold)), F.lit(False)
            ),
        )
        .drop("__dev")
    )


def slo_burn_rate(
    df: DataFrame,
    error_filter: Column,
    slo: float = 0.999,
    window_sec: int = 3600,
    fast_burn: float = 14.4,
    slow_burn: float = 6.0,
    ts: str = "ts",
    on: Sequence[str] = (),
) -> DataFrame:
    """SLO error-budget burn rate per tumbling window — the
    multi-window burn-rate alert table from the Google SRE workbook
    (ch. 5): with an SLO of ``slo`` (e.g. 0.999), the error budget is
    ``1 − slo``; a window whose error rate is R burns budget at
    ``R / (1 − slo)`` times the sustainable rate. The workbook's
    canonical thresholds: page at 14.4× (2% of a 30-day budget in
    1 h), ticket at 6× — both exposed as flag columns so the alert
    policy reads off the table. Returns per (``*on``, window):
    ``(window_start, n_events, n_errors, error_rate, burn_rate,
    page_alert, ticket_alert)``.

    Determinism: counts are exact integers; error_rate is ONE
    division (6-dp nudge); burn_rate divides the ROUNDED error rate
    by the exact literal budget; flags compare the rounded burn rate
    to literal thresholds — everything replays in SQL.

    Scale shape: one integer window-bucket projection (epoch micros
    floor-div — no session-tz ambiguity) + ONE map-side-combinable
    groupBy to (keys × windows) rows. At 100 TB this is the classic
    pre-aggregated metrics rollup; feed ``merge_additive_rollup`` for
    the incremental variant."""
    if not 0.0 < slo < 1.0:
        raise ValueError(f"slo must be in (0, 1), got {slo}")
    if window_sec <= 0:
        raise ValueError(f"window_sec must be positive, got {window_sec}")
    on = list(on)
    budget = 1.0 - slo
    width_us = int(window_sec) * 1_000_000
    staged = df.select(
        *on,
        F.timestamp_micros(
            (F.floor(_micros(F.col(ts)) / F.lit(width_us)) * width_us).cast(
                "long"
            )
        ).alias("window_start"),
        error_filter.cast("int").alias("__err"),
    )
    agg = staged.groupBy(*on, "window_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("__err").cast("long").alias("n_errors"),
    )
    err_rate = F.round(
        F.col("n_errors").cast("double") / F.col("n_events").cast("double")
        + F.lit(1e-12),
        6,
    )
    agg = agg.withColumn("error_rate", err_rate).withColumn(
        "burn_rate",
        F.round(F.col("error_rate") / F.lit(budget) + F.lit(1e-12), 6),
    )
    return agg.select(
        *on,
        "window_start",
        "n_events",
        "n_errors",
        "error_rate",
        "burn_rate",
        (F.col("burn_rate") >= F.lit(float(fast_burn))).alias("page_alert"),
        (F.col("burn_rate") >= F.lit(float(slow_burn))).alias("ticket_alert"),
    )
