"""Temporal joins: handcrafted semantics + plan-shape checks.

The sf0.001 oracle comparison lives in test_entry.py (event_asof_join /
event_range_join); these tests pin the edge semantics the oracle data
can't hit on purpose: exact-ts matches, strictness, empty windows, and
the one-Exchange plan claim."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from orientdb_spark.temporal import asof_join, range_join_count


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)), (4, "u3", _ts(30))],
        "lid INT, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts(10)),   # exactly at left lid=1
            (101, "u1", _ts(15)),
            (102, "u2", _ts(6)),    # after u2's only left row
            (103, "u3", _ts(0)),
            (104, "u3", _ts(29, 59)),
        ],
        "rid INT, k STRING, ts TIMESTAMP",
    )
    return left, right


def test_asof_backward_semantics(sides):
    left, right = sides
    out = asof_join(left, right, on=["k"], ts="ts", payload=("rid",), prefix="prev_")
    got = {r["lid"]: r["prev_rid"] for r in out.collect()}
    # lid=1: rid 100 shares the exact ts -> matched (<= semantics)
    # lid=2: most recent of {100,101} -> 101
    # lid=3: u2's only right row is later -> null
    # lid=4: latest of u3 -> 104
    assert got == {1: 100, 2: 101, 3: None, 4: 104}


def test_asof_strict_excludes_equal_ts(sides):
    left, right = sides
    out = asof_join(
        left, right, on=["k"], ts="ts", payload=("rid",), allow_exact_matches=False
    )
    got = {r["lid"]: r["prev_rid"] for r in out.collect()}
    assert got[1] is None  # the equal-ts row no longer qualifies
    assert got[2] == 101


def test_asof_keeps_left_columns_and_rowcount(sides):
    left, right = sides
    out = asof_join(left, right, on=["k"], ts="ts", payload=("rid",))
    assert out.count() == left.count()
    assert {"lid", "k", "ts", "prev_rid"} <= set(out.columns)


def test_asof_payload_prefix_collision_raises(sides):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left, right.withColumn("prev_rid", F.col("rid")), on=["k"],
                  payload=("rid", "prev_rid"), prefix="prev_")


def test_asof_single_exchange_plan(sides):
    """The whole as-of join must cost exactly one shuffle (the window's
    hashpartitioning on the key) — the scale claim in temporal.py."""
    left, right = sides
    out = asof_join(left, right, on=["k"], ts="ts", payload=("rid",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_range_join_window_boundaries(sides, spark):
    left, right = sides
    out = range_join_count(
        left, right, on=["k"], left_id="lid", ts="ts", window_sec=600
    )
    got = {r["lid"]: r["n_in_window"] for r in out.collect()}
    # lid=1 (12:10, win (12:00,12:10]): rid100@12:10 in, rid103 other key
    # lid=2 (12:20, win (12:10,12:20]): rid101@12:15 in, rid100@12:10 out (strict >)
    # lid=3 (12:05): u2's row @12:06 is later -> 0
    # lid=4 (12:30, win (12:20,12:30]): rid104@12:29:59 in
    assert got == {1: 1, 2: 1, 3: 0, 4: 1}


def test_range_join_equals_naive_inequality_join(spark, sides):
    """The binned formulation must equal the naive inequality join; the
    two-bucket probe covers every window position including the
    cross-bucket ones."""
    left, right = sides
    out = {
        (r["lid"], r["n_in_window"])
        for r in range_join_count(
            left, right, on=["k"], left_id="lid", ts="ts", window_sec=1800
        ).collect()
    }
    l, r_ = left.alias("l"), right.alias("r")
    naive = (
        l.join(
            r_,
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.ts") > F.col("l.ts") - F.expr("INTERVAL 1800 SECONDS"))
            & (F.col("r.ts") <= F.col("l.ts")),
            "left",
        )
        .groupBy("l.lid")
        .agg(F.count("r.rid").alias("n"))
    )
    assert out == {(r["lid"], r["n"]) for r in naive.collect()}


def test_range_join_hash_join_not_nested_loop(sides):
    """The point of the binning: Catalyst must plan an equi hash join,
    never BroadcastNestedLoopJoin."""
    left, right = sides
    out = range_join_count(left, right, on=["k"], left_id="lid", window_sec=600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


# --- ordered funnel (streaming.funnel shares the event-analytics family) ---


def test_funnel_ordering_semantics(spark):
    """Stage k counts only strictly after stage k-1: out-of-order and
    equal-ts events must not advance the funnel."""
    import datetime as dt

    from orientdb_spark.streaming import funnel

    T = lambda m: dt.datetime(2024, 1, 1, 12, m)
    rows = [
        (1, "u1", "view", T(1)), (2, "u1", "click", T(2)), (3, "u1", "purchase", T(3)),
        (4, "u2", "click", T(1)), (5, "u2", "view", T(2)),   # click precedes view
        (6, "u3", "purchase", T(1)),                          # no view at all
        (7, "u4", "view", T(1)), (8, "u4", "purchase", T(2)), (9, "u4", "click", T(3)),
        (10, "u5", "view", T(1)), (11, "u5", "click", T(1)),  # same-ts: not after
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id string, event_type string, ts timestamp"
    )
    got = {r["user_id"]: r["funnel_stage"] for r in funnel(df).collect()}
    assert got == {"u1": 3, "u2": 1, "u3": 0, "u4": 2, "u5": 1}


def test_funnel_single_exchange(spark):
    """The one-groupBy claim: no per-stage self-join shuffle cascade."""
    import datetime as dt

    from orientdb_spark.streaming import funnel

    df = spark.createDataFrame(
        [(1, "u", "view", dt.datetime(2024, 1, 1))],
        "event_id int, user_id string, event_type string, ts timestamp",
    )
    plan = funnel(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_funnel_custom_stages(spark):
    import datetime as dt

    from orientdb_spark.streaming import funnel

    T = lambda m: dt.datetime(2024, 1, 1, 12, m)
    df = spark.createDataFrame(
        [(1, "u", "signup", T(0)), (2, "u", "error", T(1))],
        "event_id int, user_id string, event_type string, ts timestamp",
    )
    got = funnel(df, stages=["signup", "error", "view"]).collect()
    assert got[0]["funnel_stage"] == 2


def test_cohort_retention_semantics(spark):
    """Users cohort by first-event ISO week; offsets count whole weeks."""
    import datetime as dt

    from orientdb_spark.streaming import cohort_retention

    rows = [
        # u1 first event Mon 2024-01-01 week; active again 2 weeks later
        ("u1", dt.datetime(2024, 1, 2, 10)),
        ("u1", dt.datetime(2024, 1, 16, 10)),
        # u2 same cohort week, active only that week (two events)
        ("u2", dt.datetime(2024, 1, 3, 10)),
        ("u2", dt.datetime(2024, 1, 4, 10)),
        # u3 next cohort week
        ("u3", dt.datetime(2024, 1, 8, 10)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_active"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_param_validation_guards(spark, sides):
    """Misuse fails loudly instead of producing nonsense buckets/probs."""
    from orientdb_spark.pipeline import text as _text
    from orientdb_spark.pipeline.profile import fk_orphans

    left, right = sides
    with pytest.raises(ValueError):
        range_join_count(left, right, on=["k"], left_id="lid", window_sec=0)
    with pytest.raises(ValueError):
        fk_orphans([])
    d = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        _text.lm_score(d, k=0)


def test_asof_property_vs_pandas_merge_asof(spark):
    """Property check: asof_join must agree with pandas.merge_asof per
    key on randomized event sets (derandomized hypothesis) — covers the
    empty-side / all-before / all-after / interleaved edges the fixture
    doesn't."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    ts_strat = st.integers(min_value=0, max_value=50)
    side_rows = st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), ts_strat),
        min_size=0,
        max_size=10,
    )

    @settings(
        max_examples=20,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(side_rows, side_rows)
    def run(lrows, rrows):
        if not lrows:
            return
        # unique (key, ts) on the right — the documented determinism
        # precondition (merge_asof also requires sorted unique backing)
        rrows = list({(k, t): None for k, t in rrows}.keys())
        l = spark.createDataFrame(
            [(i, k, dt.datetime(2024, 1, 1, 0, 0, t)) for i, (k, t) in enumerate(lrows)],
            "lid INT, k STRING, ts TIMESTAMP",
        )
        r = spark.createDataFrame(
            [(100 + i, k, dt.datetime(2024, 1, 1, 0, 0, t)) for i, (k, t) in enumerate(rrows)],
            "rid INT, k STRING, ts TIMESTAMP",
        ) if rrows else spark.createDataFrame([], "rid INT, k STRING, ts TIMESTAMP")
        got = {
            row["lid"]: row["prev_rid"]
            for row in asof_join(l, r, on=["k"], ts="ts", payload=("rid",)).collect()
        }
        lp = l.toPandas().sort_values("ts")
        rp = r.toPandas().sort_values("ts")
        merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        exp = {
            int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
            for row in merged.itertuples()
        }
        assert got == exp

    run()


def test_asof_rejects_left_column_collisions(sides, spark):
    left, right = sides
    with pytest.raises(ValueError):
        asof_join(left.withColumn("prev_rid", F.lit(1)), right, on=["k"],
                  payload=("rid",), prefix="prev_")
    with pytest.raises(ValueError):
        asof_join(left.withColumn("__r_rid", F.lit(1)), right, on=["k"],
                  payload=("rid",))
    from orientdb_spark.pipeline.quantize import scalar_quantize

    empty = spark.createDataFrame([], "vec_id INT, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError):
        scalar_quantize(empty)


def test_range_join_property_vs_naive(spark):
    """Property check: the binned range join equals the naive inequality
    join on randomized timestamps, including bucket-boundary landings
    (derandomized hypothesis)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    ts_strat = st.integers(min_value=0, max_value=120)  # seconds
    rows = st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), ts_strat), min_size=0, max_size=8
    )

    @settings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows, rows)
    def run(lrows, rrows):
        if not lrows:
            return
        base = dt.datetime(2024, 1, 1)
        l = spark.createDataFrame(
            [
                (i, k, base + dt.timedelta(seconds=t))
                for i, (k, t) in enumerate(lrows)
            ],
            "lid INT, k STRING, ts TIMESTAMP",
        )
        r = spark.createDataFrame(
            [
                (100 + i, k, base + dt.timedelta(seconds=t))
                for i, (k, t) in enumerate(rrows)
            ],
            "rid INT, k STRING, ts TIMESTAMP",
        ) if rrows else spark.createDataFrame([], "rid INT, k STRING, ts TIMESTAMP")
        win = 30  # seconds — several bucket boundaries inside the ts range
        got = {
            (row["lid"], row["n_in_window"])
            for row in range_join_count(
                l, r, on=["k"], left_id="lid", ts="ts", window_sec=win
            ).collect()
        }
        exp = {}
        for i, (k, t) in enumerate(lrows):
            exp[i] = sum(1 for (rk, rt) in rrows if rk == k and t - win < rt <= t)
        assert got == {(i, n) for i, n in exp.items()}

    run()


def test_funnel_property_vs_python(spark):
    """Property check: funnel stages match a sequential-scan Python
    reference on randomized event streams (ties, repeats, gaps)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from orientdb_spark.streaming import funnel

    STAGES = ["view", "click", "purchase"]
    ev = st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.sampled_from(STAGES + ["other"]),
        st.integers(min_value=0, max_value=20),
    )
    stream = st.lists(ev, min_size=1, max_size=15)

    @settings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(stream)
    def run(rows):
        df = spark.createDataFrame(
            [
                (i, u, ty, dt.datetime(2024, 1, 1, 0, 0, t))
                for i, (u, ty, t) in enumerate(rows)
            ],
            "event_id INT, user_id STRING, event_type STRING, ts TIMESTAMP",
        )
        got = {r["user_id"]: r["funnel_stage"] for r in funnel(df, stages=STAGES).collect()}
        exp = {}
        for u in {u for (u, ty, _) in rows if ty in STAGES}:
            evs = sorted(
                [(t, ty) for (uu, ty, t) in rows if uu == u and ty in STAGES]
            )
            cur, stage = None, 0
            for want in STAGES:
                nxt = [t for (t, ty) in evs if ty == want and (cur is None or t > cur)]
                if not nxt:
                    break
                cur = min(nxt)
                stage += 1
            exp[u] = stage
        assert got == exp

    run()


def test_asof_forward_direction(sides):
    """direction='forward' picks the earliest right row at-or-after the
    left ts (merge_asof forward semantics)."""
    left, right = sides
    out = asof_join(
        left, right, on=["k"], ts="ts", payload=("rid",), direction="forward"
    )
    got = {r["lid"]: r["prev_rid"] for r in out.collect()}
    # lid=1 (12:10): rid100@12:10 at-or-after -> 100
    # lid=2 (12:20): nothing after for u1 -> None
    # lid=3 (12:05): rid102@12:06 -> 102
    # lid=4 (12:30): nothing after for u3 -> None
    assert got == {1: 100, 2: None, 3: 102, 4: None}
    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], direction="sideways")


def test_asof_forward_matches_pandas(spark, sides):
    import pandas as pd

    left, right = sides
    got = {
        r["lid"]: r["prev_rid"]
        for r in asof_join(
            left, right, on=["k"], payload=("rid",), direction="forward"
        ).collect()
    }
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    exp = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == exp


def test_hierarchical_rollup_levels_compose(spark):
    """Coarser levels must equal direct aggregation: counts sum, mins
    min, across a fixture spanning two hours of one day."""
    import datetime as dt

    from orientdb_spark.streaming import hierarchical_rollup

    rows = [
        ("a", dt.datetime(2024, 1, 1, 10, 0, 30), 1.0),
        ("a", dt.datetime(2024, 1, 1, 10, 0, 45), 3.0),
        ("a", dt.datetime(2024, 1, 1, 11, 59, 0), 5.0),
        ("b", dt.datetime(2024, 1, 1, 10, 30, 0), -2.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        (r["resolution"], str(r["window_start"]), r["key"]): (
            r["n_events"], r["total_value"], r["min_value"], r["max_value"]
        )
        for r in hierarchical_rollup(df).collect()
    }
    assert out[("minute", "2024-01-01 10:00:00", "a")] == (2, 4.0, 1.0, 3.0)
    assert out[("hour", "2024-01-01 10:00:00", "a")] == (2, 4.0, 1.0, 3.0)
    assert out[("day", "2024-01-01 00:00:00", "a")] == (3, 9.0, 1.0, 5.0)
    assert out[("day", "2024-01-01 00:00:00", "b")] == (1, -2.0, -2.0, -2.0)


def test_rollup_merge_equals_full_recompute(spark):
    """The incremental-refresh invariant:
    rollup_merge(rollup(a), b) == rollup(a UNION b) — including buckets
    only one side touches and buckets both touch."""
    import datetime as dt

    from orientdb_spark.streaming import hierarchical_rollup, rollup_merge

    schema = "event_type string, ts timestamp, value double"
    a = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 10, 0, 30), 1.0),
            ("a", dt.datetime(2024, 1, 1, 11, 5, 0), 7.0),
            ("b", dt.datetime(2024, 1, 2, 9, 0, 0), 2.0),
        ],
        schema,
    )
    b = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 10, 0, 45), -4.0),  # same minute as a's first
            ("c", dt.datetime(2024, 1, 3, 8, 0, 0), 9.0),     # brand-new key/day
        ],
        schema,
    )
    merged = {
        tuple(r)
        for r in rollup_merge(hierarchical_rollup(a), b).collect()
    }
    full = {
        tuple(r) for r in hierarchical_rollup(a.unionByName(b)).collect()
    }
    assert merged == full
    # the shared minute actually merged (not duplicated)
    m = {
        (r[0], str(r[1]), r[2]): r[3:]
        for r in merged
    }
    assert m[("minute", "2024-01-01 10:00:00", "a")] == (2, -3.0, -4.0, 1.0)


def test_asof_composite_key(spark):
    """Multi-column join keys partition the window correctly — rows
    must never match across a partial key overlap."""
    left = spark.createDataFrame(
        [(1, "a", "x", _ts(10)), (2, "a", "y", _ts(10))],
        "lid INT, k1 STRING, k2 STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(100, "a", "x", _ts(5)), (101, "a", "y", _ts(7)), (102, "b", "x", _ts(1))],
        "rid INT, k1 STRING, k2 STRING, ts TIMESTAMP",
    )
    out = asof_join(left, right, on=["k1", "k2"], payload=("rid",))
    got = {r["lid"]: r["prev_rid"] for r in out.collect()}
    assert got == {1: 100, 2: 101}


def test_rollup_custom_levels(spark):
    """Non-default level lists flow through the hierarchy (hour -> day
    only) and merge with matching levels."""
    import datetime as dt

    from orientdb_spark.streaming import hierarchical_rollup

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 10, 0, 30), 1.0),
         ("a", dt.datetime(2024, 1, 1, 12, 0, 0), 2.0)],
        "event_type string, ts timestamp, value double",
    )
    out = hierarchical_rollup(df, levels=["hour", "day"])
    res = {r["resolution"] for r in out.collect()}
    assert res == {"hour", "day"}
    day = [r for r in out.collect() if r["resolution"] == "day"]
    assert len(day) == 1 and day[0]["n_events"] == 2 and day[0]["total_value"] == 3.0


def test_gap_fill_forward_fills_and_flags(spark):
    import datetime as dt

    from orientdb_spark.temporal import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, 10.0),
        ("u1", t0 + dt.timedelta(hours=3), 40.0),
        ("u2", t0 + dt.timedelta(hours=1), 7.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = gap_fill(df, on=["user_id"], step_sec=3600)
    got = {
        (r["user_id"], r["bucket_ts"].hour): (r["n_obs"], r["value"], r["is_gap"])
        for r in out.collect()
    }
    # u1: hours 0..3, hours 1-2 are gaps carrying 10.0 forward
    assert got[("u1", 0)] == (1, 10.0, False)
    assert got[("u1", 1)] == (0, 10.0, True)
    assert got[("u1", 2)] == (0, 10.0, True)
    assert got[("u1", 3)] == (1, 40.0, False)
    # u2 spans a single bucket — no spine beyond its own extent
    assert [k for k in got if k[0] == "u2"] == [("u2", 1)]


def test_gap_fill_buckets_average_multiple_obs(spark):
    import datetime as dt

    from orientdb_spark.temporal import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", t0 + dt.timedelta(minutes=5), 2.0),
        ("k", t0 + dt.timedelta(minutes=50), 4.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    got = gap_fill(df, on=["k"], step_sec=3600).collect()
    assert len(got) == 1 and got[0]["n_obs"] == 2 and got[0]["value"] == 3.0


def test_scd2_collapses_unchanged_and_closes_intervals(spark):
    import datetime as dt

    from orientdb_spark.temporal import scd2_intervals

    t = lambda h: dt.datetime(2024, 1, 1, h, 0, 0)
    rows = [
        ("u", t(0), "A"),
        ("u", t(1), "A"),   # unchanged -> collapses into version 1
        ("u", t(2), "B"),
        ("u", t(3), "A"),   # back to A: NEW interval, not merged with v1
        ("v", t(0), "X"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "state"])
    out = scd2_intervals(df, key="user_id", attrs=["state"]).collect()
    by = {(r["user_id"], r["version"]): r for r in out}
    assert len(by) == 4
    assert by[("u", 1)]["state"] == "A" and by[("u", 1)]["valid_to"] == t(2)
    assert by[("u", 2)]["state"] == "B" and by[("u", 2)]["valid_to"] == t(3)
    assert by[("u", 3)]["state"] == "A" and by[("u", 3)]["valid_to"] is None
    assert by[("u", 3)]["is_current"] and not by[("u", 1)]["is_current"]
    assert by[("v", 1)]["is_current"]


def test_scd2_null_transitions_are_changes(spark):
    import datetime as dt

    from orientdb_spark.temporal import scd2_intervals

    t = lambda h: dt.datetime(2024, 1, 1, h, 0, 0)
    rows = [("u", t(0), None), ("u", t(1), None), ("u", t(2), "A")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "state"]).withColumn(
        "state", F.col("state").cast("string")
    )
    out = scd2_intervals(df, key="user_id", attrs=["state"]).collect()
    # NULL->NULL collapses (null-safe equal); NULL->A is a change
    assert len(out) == 2


def test_scd2_single_partitioning(spark):
    """Both stacked windows share one (key) exchange."""
    import datetime as dt
    import re

    from orientdb_spark.temporal import scd2_intervals

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame([("u", t0, "A")], ["user_id", "ts", "state"])
    out = scd2_intervals(df, key="user_id", attrs=["state"])
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE)) == 1, plan


def test_rolling_aggregate_window_boundaries(spark):
    import datetime as dt

    from orientdb_spark.temporal import rolling_aggregate

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u", t0, 1.0),
        ("u", t0 + dt.timedelta(minutes=30), 2.0),
        ("u", t0 + dt.timedelta(minutes=60), 4.0),   # exactly 1h after t0: inclusive
        ("u", t0 + dt.timedelta(minutes=61), 8.0),   # t0 drops out
        ("v", t0 + dt.timedelta(minutes=45), 100.0), # other key isolated
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r["user_id"], int((r["ts"] - t0).total_seconds() // 60)): (
            r["rolling_n"],
            r["rolling_sum"],
        )
        for r in rolling_aggregate(df, on=["user_id"], window_sec=3600).collect()
    }
    assert out[("u", 0)] == (1, 1.0)
    assert out[("u", 30)] == (2, 3.0)
    assert out[("u", 60)] == (3, 7.0)   # inclusive lower bound: t0 still in
    assert out[("u", 61)] == (3, 14.0)  # t0 aged out
    assert out[("v", 45)] == (1, 100.0)  # keys isolated


def test_merge_upsert_semantics_and_schema_guard(spark):
    import pytest as _pytest

    from orientdb_spark.storage import merge_upsert

    t = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    s = spark.createDataFrame([(2, "B"), (9, "Z")], ["k", "v"])
    got = sorted(map(tuple, merge_upsert(t, s, "k").collect()))
    assert got == [(1, "a"), (2, "B"), (3, "c"), (9, "Z")]
    with _pytest.raises(ValueError):
        merge_upsert(t, s.withColumnRenamed("v", "w"), "k")


def test_rolling_equals_self_range_join(spark):
    """The skew-immune formulation: range_join_count(df, df) computes the
    same trailing counts/sums as the RANGE-frame window when (key, ts)
    is unique — the documented monster-key escape hatch, proven
    equivalent on real data."""
    from orientdb_spark.temporal import range_join_count, rolling_aggregate

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    win = rolling_aggregate(ev, on=["user_id"], window_sec=1800).select(
        "event_id", "rolling_n", F.round("rolling_sum", 6).alias("s")
    )
    # half-open window (t-w, t] vs closed [t-w, t]: on this data no two
    # same-user events are exactly 1800s apart, so the two agree; the
    # boundary difference is covered by the handcrafted tests above
    rj = range_join_count(
        ev, ev, on=["user_id"], left_id="event_id", window_sec=1800, value="value"
    ).select("event_id", F.col("n_in_window").alias("rolling_n"),
             F.round("sum_value", 6).alias("s"))
    assert win.count() == rj.count()
    assert win.exceptAll(rj).count() == 0


def _py_gap_fill(rows, step):
    """Sequential reference: bucket avg + dense spine + forward fill."""
    from collections import defaultdict

    obs = defaultdict(list)
    for k, ts_us, v in rows:
        obs[(k, ts_us // (step * 1_000_000))].append(v)
    out = {}
    keys = {k for k, _, _ in rows}
    for k in keys:
        bs = sorted(b for kk, b in obs if kk == k)
        carry = None
        for b in range(bs[0], bs[-1] + 1):
            vals = obs.get((k, b))
            if vals:
                carry = sum(vals) / len(vals)
                out[(k, b)] = (len(vals), round(carry, 6), False)
            else:
                out[(k, b)] = (0, round(carry, 6), True)
    return out


def test_gap_fill_property_random_series(spark):
    import datetime as dt
    import random

    from orientdb_spark.temporal import gap_fill

    rng = random.Random(17)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for k in ("a", "b", "c"):
        for _ in range(rng.randrange(3, 12)):
            ts = base + dt.timedelta(minutes=rng.randrange(0, 3000))
            rows.append((k, ts, round(rng.uniform(-5, 5), 3)))
    rows = list({(k, ts): v for k, ts, v in rows}.items())
    rows = [(k, ts, v) for (k, ts), v in rows]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    got = {
        (r["k"], int(r["bucket_ts"].timestamp() // 3600)): (
            r["n_obs"],
            round(r["value"], 6),
            r["is_gap"],
        )
        for r in gap_fill(df, on=["k"], step_sec=3600).collect()
    }
    ref = _py_gap_fill(
        [(k, int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000), v)
         for k, ts, v in rows],
        3600,
    )
    assert got == ref


def _py_scd2(rows):
    """Sequential reference: change-collapse + interval close per key."""
    from collections import defaultdict

    by = defaultdict(list)
    for k, ts, a in rows:
        by[k].append((ts, a))
    out = []
    for k, seq in by.items():
        seq.sort()
        changes = [
            (ts, a)
            for i, (ts, a) in enumerate(seq)
            if i == 0 or a != seq[i - 1][1]
        ]
        for i, (ts, a) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.append((k, a, ts, nxt, i + 1, nxt is None))
    return sorted(out)


def test_scd2_property_random_streams(spark):
    import datetime as dt
    import random

    from orientdb_spark.temporal import scd2_intervals

    rng = random.Random(29)
    base = dt.datetime(2024, 3, 1)
    rows = []
    used = set()
    for k in ("u", "v", "w"):
        for _ in range(rng.randrange(4, 15)):
            ts = base + dt.timedelta(minutes=rng.randrange(0, 500))
            if (k, ts) in used:
                continue
            used.add((k, ts))
            rows.append((k, ts, rng.choice("AB")))
    df = spark.createDataFrame(rows, ["user_id", "ts", "state"])
    got = sorted(
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in scd2_intervals(df, key="user_id", attrs=["state"]).collect()
    )
    assert got == _py_scd2(rows)


# --- time-weighted average / interval overlap / rolling z-score ---


def test_twa_locf_weighting(spark):
    """Value holds until the next sample: weights are the forward gaps,
    the last sample carries none; a zero-span key falls back to the
    plain mean."""
    from orientdb_spark.temporal import time_weighted_average

    df = spark.createDataFrame(
        [
            # key a: 10 held 10s, 20 held 20s, 99 unweighted
            ("a", _ts(0, 0), 10.0),
            ("a", _ts(0, 10), 20.0),
            ("a", _ts(0, 30), 99.0),
            # key b: single sample -> plain mean fallback
            ("b", _ts(0, 0), 7.0),
            # key c: two samples at one instant -> span 0 -> mean
            ("c", _ts(5), 1.0),
            ("c", _ts(5), 3.0),
        ],
        "k STRING, ts TIMESTAMP, value DOUBLE",
    )
    got = {
        r["k"]: (r["n_samples"], r["span_us"], round(r["twa"], 6))
        for r in time_weighted_average(df, on=["k"]).collect()
    }
    assert got["a"] == (3, 30_000_000, round((10 * 10 + 20 * 20) / 30, 6))
    assert got["b"] == (1, 0, 7.0)
    assert got["c"] == (2, 0, 2.0)


def test_twa_single_exchange(spark):
    from orientdb_spark.temporal import time_weighted_average

    df = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "k STRING, ts TIMESTAMP, value DOUBLE"
    )
    out = time_weighted_average(df, on=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # window exchange reused by the groupBy -> exactly one shuffle
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


@pytest.fixture(scope="module")
def interval_sides(spark):
    left = spark.createDataFrame(
        [
            # (lid, key, start, end)
            (1, "u1", _ts(0), _ts(10)),
            (2, "u1", _ts(40), _ts(50)),
            (3, "u2", _ts(0), _ts(59)),   # longer than one bucket
            (4, "u3", _ts(5), _ts(6)),
        ],
        "lid INT, k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts(10), _ts(12)),  # touches lid=1 at its endpoint
            (101, "u1", _ts(20), _ts(30)),  # gap -> overlaps nothing
            (102, "u1", _ts(39), _ts(41)),  # crosses into lid=2
            (103, "u2", _ts(30), _ts(58)),  # long, shares 2+ buckets w/ lid=3
            (104, "u2", _ts(58), _ts(59)),
        ],
        "rid INT, k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    return left, right


def test_interval_overlap_semantics(interval_sides):
    """Inclusive endpoint touch counts; multi-bucket pairs count once;
    zero-overlap left rows survive with 0."""
    from orientdb_spark.temporal import interval_overlap_count

    left, right = interval_sides
    out = interval_overlap_count(
        left, right, on=["k"], left_id="lid", right_id="rid", bucket_sec=600
    )
    got = {r["lid"]: r["n_overlaps"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 0}


def test_interval_overlap_equals_naive(spark, interval_sides):
    from orientdb_spark.temporal import interval_overlap_count

    left, right = interval_sides
    for w in (60, 600, 7200):
        out = {
            (r["lid"], r["n_overlaps"])
            for r in interval_overlap_count(
                left, right, on=["k"], left_id="lid", right_id="rid",
                bucket_sec=w,
            ).collect()
        }
        l, r_ = left.alias("l"), right.alias("r")
        naive = (
            l.join(
                r_,
                (F.col("l.k") == F.col("r.k"))
                & (F.col("l.start_ts") <= F.col("r.end_ts"))
                & (F.col("r.start_ts") <= F.col("l.end_ts")),
                "left",
            )
            .groupBy("l.lid")
            .agg(F.count_distinct(F.col("r.rid")).alias("n"))
        )
        assert out == {(r["lid"], r["n"]) for r in naive.collect()}, w


def test_interval_overlap_hash_join_not_nested_loop(interval_sides):
    from orientdb_spark.temporal import interval_overlap_count

    left, right = interval_sides
    out = interval_overlap_count(
        left, right, on=["k"], left_id="lid", right_id="rid", bucket_sec=600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_anomaly_zscore_flags_outlier(spark):
    """Nine near-constant values then a spike: the spike's
    trailing-window z exceeds the threshold; cold-start rows
    (n < min_samples) stay null; a 1-row frame yields NULL std (not
    Spark's NaN); a zero-variance window also yields null z."""
    from orientdb_spark.temporal import anomaly_zscore

    rows = [("u1", _ts(i), 10.0 + (i % 2)) for i in range(9)] + [
        ("u1", _ts(9), 100.0)
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    out = (
        anomaly_zscore(df, on=["k"], window_sec=3600, z_threshold=2.5)
        .orderBy("ts")
        .collect()
    )
    assert out[0]["rolling_std"] is None          # 1-row frame
    assert all(r["zscore"] is None for r in out[:4])   # cold start
    assert out[4]["zscore"] is not None
    # zero-variance window: constant values -> null z even past min_samples
    const = spark.createDataFrame(
        [("u2", _ts(i), 5.0) for i in range(8)],
        "k STRING, ts TIMESTAMP, value DOUBLE",
    )
    cz = anomaly_zscore(const, on=["k"], window_sec=3600).collect()
    assert all(r["zscore"] is None for r in cz)
    spike = out[-1]
    assert spike["zscore"] > 2.5 and spike["is_anomaly"] is True
    assert all(r["is_anomaly"] is not True for r in out[:-1])


def test_anomaly_zscore_param_validation(spark):
    from orientdb_spark.temporal import anomaly_zscore

    df = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "k STRING, ts TIMESTAMP, value DOUBLE"
    )
    with pytest.raises(ValueError):
        anomaly_zscore(df, on=["k"], window_sec=0)
    with pytest.raises(ValueError):
        anomaly_zscore(df, on=["k"], min_samples=1)


def test_trend_fit_recovers_known_line(spark):
    """y = 3x + 5 over days recovers slope 3, intercept 5, R² = 1;
    noisy keys get R² < 1; a 1-sample key nulls out."""
    import datetime as dt

    from orientdb_spark.temporal import trend_fit

    day0 = dt.datetime(2024, 1, 1)
    x0 = (day0 - dt.datetime(1970, 1, 1)).days
    rows = [
        ("lin", day0 + dt.timedelta(days=i), 3.0 * (x0 + i) + 5.0) for i in range(10)
    ] + [
        ("noisy", day0 + dt.timedelta(days=i), float(i % 3)) for i in range(10)
    ] + [("single", day0, 7.0)]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    got = {r["k"]: r for r in trend_fit(df, on=["k"]).collect()}
    assert abs(got["lin"]["slope_per_day"] - 3.0) < 1e-6
    assert abs(got["lin"]["intercept"] - 5.0) < 1e-3
    assert abs(got["lin"]["r2"] - 1.0) < 1e-9
    assert got["noisy"]["r2"] < 0.5
    assert got["single"]["slope_per_day"] is None


def test_m4_downsample_semantics(spark):
    """Each bucket keeps exactly first/last/min/max by event time; a
    single-point bucket repeats its value four times."""
    from orientdb_spark.temporal import m4_downsample

    rows = [
        ("k", _ts(0, 0), 5.0),    # bucket 0: first
        ("k", _ts(0, 10), 1.0),   #   min
        ("k", _ts(0, 20), 9.0),   #   max
        ("k", _ts(0, 30), 4.0),   #   last
        ("k", _ts(2, 0), 7.0),    # bucket 2 (60s buckets): singleton
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    got = {
        r["bucket_start_us"]: (
            r["n_points"], r["v_first"], r["v_last"], r["v_min"], r["v_max"]
        )
        for r in m4_downsample(df, on=["k"], bucket_sec=60).collect()
    }
    buckets = sorted(got)
    assert got[buckets[0]] == (4, 5.0, 4.0, 1.0, 9.0)
    assert got[buckets[1]] == (1, 7.0, 7.0, 7.0, 7.0)
    import pytest

    with pytest.raises(ValueError):
        m4_downsample(df, on=["k"], bucket_sec=0)


def test_anomaly_binned_equals_window_form(spark):
    """The monster-key escape hatch must reproduce the window operator
    exactly on real data (z is 4dp-rounded in both; mean/std compared
    at 6dp to absorb the sum-of-squares vs Welford FP difference)."""
    from orientdb_spark.temporal import anomaly_zscore, anomaly_zscore_binned

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cols = ["event_id", "user_id"]

    def norm(df):
        return {
            tuple(r[c] for c in cols): (
                round(r["rolling_mean"], 6),
                None if r["rolling_std"] is None else round(r["rolling_std"], 6),
                r["zscore"],
                r["is_anomaly"],
            )
            for r in df.collect()
        }

    a = norm(anomaly_zscore(ev, on=["user_id"], window_sec=86400, z_threshold=2.0))
    b = norm(
        anomaly_zscore_binned(ev, on=["user_id"], window_sec=86400, z_threshold=2.0)
    )
    assert a == b


def test_twa_property_vs_python(spark):
    """Random irregular streams: TWA equals the sequential LOCF
    computation."""
    import random

    from orientdb_spark.temporal import time_weighted_average

    rng = random.Random(71)
    base = dt.datetime(2024, 5, 1)
    rows = []
    for k in ("a", "b", "c"):
        ts_set = sorted(rng.sample(range(0, 50_000), rng.randrange(1, 40)))
        rows += [
            (k, base + dt.timedelta(seconds=s), round(rng.uniform(-5, 5), 3))
            for s in ts_set
        ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")

    def py_twa(series):
        series = sorted(series)
        if len(series) < 2:
            return series[0][1] if series else None
        num = den = 0.0
        for (t0, v), (t1, _) in zip(series, series[1:]):
            w = (t1 - t0).total_seconds() * 1e6
            num += v * w
            den += w
        return num / den if den else sum(v for _, v in series) / len(series)

    byk = {}
    for k, t, v in rows:
        byk.setdefault(k, []).append((t, v))
    got = {r["k"]: r["twa"] for r in time_weighted_average(df, on=["k"]).collect()}
    for k, series in byk.items():
        assert abs(got[k] - py_twa(series)) < 1e-9, k


def test_interval_overlap_property_vs_python(spark):
    """Random interval sets at several bucket widths equal the
    quadratic reference."""
    import random

    from orientdb_spark.temporal import interval_overlap_count

    rng = random.Random(43)
    base = dt.datetime(2024, 5, 1)

    def mk(n, max_len):
        out = []
        for i in range(n):
            s = rng.randrange(0, 20_000)
            e = s + rng.randrange(0, max_len)
            out.append(
                (i, rng.choice("xy"), base + dt.timedelta(seconds=s),
                 base + dt.timedelta(seconds=e))
            )
        return out

    L, R = mk(25, 900), mk(30, 2500)
    ldf = spark.createDataFrame(L, "lid INT, k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP")
    rdf = spark.createDataFrame(R, "rid INT, k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP")
    want = {
        lid: sum(
            1
            for (rid, rk, rs, re_) in R
            if rk == k and ls <= re_ and rs <= le
        )
        for (lid, k, ls, le) in L
    }
    for w in (300, 1800, 7200):
        got = {
            r["lid"]: r["n_overlaps"]
            for r in interval_overlap_count(
                ldf, rdf, on=["k"], left_id="lid", right_id="rid", bucket_sec=w
            ).collect()
        }
        assert got == want, w


def test_anomaly_property_vs_python(spark):
    """Random streams: window stats and z equal a sequential trailing-
    window reference (inclusive both ends)."""
    import random

    from orientdb_spark.temporal import anomaly_zscore

    rng = random.Random(97)
    base = dt.datetime(2024, 5, 1)
    rows = []
    for k in ("a", "b"):
        secs = sorted(rng.sample(range(0, 30_000), 35))
        rows += [
            (k, base + dt.timedelta(seconds=s), round(rng.uniform(0, 100), 2))
            for s in secs
        ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    W = 5000
    got = {
        (r["k"], r["ts"]): (r["zscore"], r["is_anomaly"])
        for r in anomaly_zscore(
            df, on=["k"], window_sec=W, z_threshold=1.5, min_samples=5
        ).collect()
    }
    byk = {}
    for k, t, v in rows:
        byk.setdefault(k, []).append((t, v))
    for k, series in byk.items():
        series.sort()
        for t, v in series:
            win = [x for (u, x) in series if 0 <= (t - u).total_seconds() <= W]
            n = len(win)
            z = None
            if n >= 5:
                m = sum(win) / n
                var = sum((x - m) ** 2 for x in win) / (n - 1)
                if var ** 0.5 > 1e-12:
                    z = round((v - m) / var ** 0.5, 4)
            flag = None if z is None else abs(z) > 1.5
            gz, gf = got[(k, t)]
            assert (gz is None) == (z is None), (k, t)
            if z is not None:
                assert abs(gz - z) <= 1e-4 + 1e-12, (k, t, gz, z)
                assert gf == flag or abs(abs(z) - 1.5) < 1e-3, (k, t)


def test_cusum_detects_planted_shift_not_noise(spark):
    """Mean shift of 3 sigma at step 100: first alarm lands within 15
    samples of the shift, direction 'up'; a stationary key raises
    nothing; equality with a sequential Python reference."""
    import random

    from orientdb_spark.temporal import cusum_changepoints

    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        rows.append(("a", base + dt.timedelta(minutes=i),
                     rng.gauss(0 if i < 100 else 3, 1)))
    for i in range(200):
        rows.append(("b", base + dt.timedelta(minutes=i), rng.gauss(0, 1)))
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    got = cusum_changepoints(df, on=["k"], target=0.0, scale=1.0).collect()
    a_alarms = sorted(r["ts"] for r in got if r["k"] == "a")
    assert a_alarms and a_alarms[0] <= base + dt.timedelta(minutes=115)
    assert all(r["direction"] == "up" for r in got if r["k"] == "a")
    assert not [r for r in got if r["k"] == "b"]

    # sequential reference equality (same resets, same statistics)
    def py_cusum(series, k=0.5, h=5.0):
        sp = sn = 0.0
        out = []
        for t, v in sorted(series):
            x = v
            sp = max(0.0, sp + x - k)
            sn = min(0.0, sn + x + k)
            if sp > h:
                out.append((t, "up", round(sp, 9)))
                sp = sn = 0.0
            elif sn < -h:
                out.append((t, "down", round(sn, 9)))
                sp = sn = 0.0
        return out

    byk = {}
    for kk, t, v in rows:
        byk.setdefault(kk, []).append((t, v))
    for kk, series in byk.items():
        want = py_cusum(series)
        have = sorted(
            (r["ts"], r["direction"], round(r["statistic"], 9))
            for r in got
            if r["k"] == kk
        )
        assert have == want, kk


def test_cusum_default_per_key_baseline_and_validation(spark):
    import pytest

    from orientdb_spark.temporal import cusum_changepoints

    base = dt.datetime(2024, 1, 1)
    rows = [("z", base + dt.timedelta(minutes=i), float(i % 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    # stationary alternation around its own mean -> no alarms
    assert cusum_changepoints(df, on=["k"]).count() == 0
    with pytest.raises(ValueError):
        cusum_changepoints(df, on=["k"], h=0)
    with pytest.raises(ValueError):
        cusum_changepoints(df, on=["k"], target=1.0)  # scale missing


def test_seasonal_baseline_profile_and_residual(spark):
    """Hour slots profile independently per key; residuals sum to ~0
    within each (key, slot); unknown period rejected."""
    from orientdb_spark.temporal import seasonal_baseline

    rows = []
    for d in range(4):
        rows.append(("k", dt.datetime(2024, 1, 1 + d, 9, 0), 10.0 + d))   # 9h: mean 11.5
        rows.append(("k", dt.datetime(2024, 1, 1 + d, 17, 0), 100.0 + d))  # 17h: mean 101.5
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    out = seasonal_baseline(df, on=["k"]).collect()
    for r in out:
        assert r["seasonal_mean"] == (11.5 if r["season_slot"] == 9 else 101.5)
    by_slot = {}
    for r in out:
        by_slot.setdefault(r["season_slot"], 0.0)
        by_slot[r["season_slot"]] += r["residual"]
    assert all(abs(v) < 1e-9 for v in by_slot.values())
    import pytest

    with pytest.raises(ValueError):
        seasonal_baseline(df, on=["k"], period="phase_of_moon")


def test_interarrival_burstiness_known_shapes(spark):
    """Perfectly periodic gaps -> B = -1 (sigma 0); a single event has
    no gaps (nulls); a bursty train sits above the periodic one."""
    from orientdb_spark.temporal import interarrival_stats

    rows = (
        [("per", _ts(0, 10 * i), 0.0) for i in range(6)]          # gaps all 10s
        + [("one", _ts(0, 0), 0.0)]
        + [("burst", _ts(0, s), 0.0) for s in (0, 1, 2, 3, 50)]   # long tail gap
    )
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    got = {r["k"]: r for r in interarrival_stats(df, on=["k"]).collect()}
    p = got["per"]
    assert (p["n_gaps"], p["mean_gap_sec"], p["std_gap_sec"]) == (5, 10.0, 0.0)
    assert p["burstiness"] == -1.0 and p["cv"] == 0.0
    o = got["one"]
    assert o["n_gaps"] == 0 and o["mean_gap_sec"] is None and o["burstiness"] is None
    assert got["burst"]["burstiness"] > p["burstiness"]
    assert got["burst"]["cv"] > 1.0  # heavier-than-Poisson dispersion


def test_anomaly_binned_preserves_duplicate_rows(spark):
    """r6 ADVICE: exact-duplicate input rows must stay distinct output
    rows (row-key grouping, not group-by-every-column), and a map-typed
    passenger column must not break the aggregate."""
    from orientdb_spark.temporal import anomaly_zscore_binned

    base = dt.datetime(2024, 5, 1)
    rows = [
        ("k1", base + dt.timedelta(seconds=s), v)
        for s, v in [(0, 1.0), (60, 2.0), (120, 3.0), (180, 4.0), (240, 100.0)]
    ]
    rows.append(rows[2])  # exact duplicate
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, value DOUBLE")
    out = anomaly_zscore_binned(df, on=["k"], window_sec=3600, min_samples=2)
    assert out.count() == 6
    # the duplicate pair carries identical stats
    dups = out.filter(F.col("value") == 3.0).collect()
    assert len(dups) == 2
    assert dups[0]["rolling_mean"] == dups[1]["rolling_mean"]
    # a map column rides along untouched
    withmap = df.withColumn("props", F.create_map(F.lit("a"), F.lit(1)))
    out2 = anomaly_zscore_binned(withmap, on=["k"], window_sec=3600, min_samples=2)
    assert out2.count() == 6 and "props" in out2.columns


def test_interval_overlap_rejects_malformed_input(spark, interval_sides):
    """r6 ADVICE: inverted intervals raise instead of silently seeding
    a descending bucket sequence; colliding id column names are
    rejected up front."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from orientdb_spark.temporal import interval_overlap_count

    left, right = interval_sides
    bad = spark.createDataFrame(
        [(9, "u1", _ts(50), _ts(40))],
        "lid INT, k STRING, start_ts TIMESTAMP, end_ts TIMESTAMP",
    )
    with pytest.raises(Exception) as ei:
        interval_overlap_count(
            left.unionByName(bad), right, on=["k"], left_id="lid",
            right_id="rid", bucket_sec=600,
        ).collect()
    assert "end_ts < start_ts" in str(ei.value) and "lid=9" in str(ei.value)
    with pytest.raises(ValueError, match="must differ"):
        interval_overlap_count(
            left, right.withColumnRenamed("rid", "lid"),
            on=["k"], left_id="lid", right_id="lid",
        )


def test_last_touch_attribution_hand_checked(spark):
    """Attribution picks the latest in-window touch (same-ts touches
    attributable, highest id wins ties), expires touches past the
    lookback, and leaves pre-touch conversions unattributed."""
    import datetime as dt

    import pytest

    from orientdb_spark.temporal import last_touch_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def r(eid, uid, sec, typ):
        return (eid, uid, t0 + dt.timedelta(seconds=sec), typ)

    ev = spark.createDataFrame(
        [
            r(1, 1, 0, "click"),
            r(2, 1, 50, "view"),          # latest touch before conv 3
            r(3, 1, 100, "purchase"),     # attributed to 2 (50s ago)
            r(4, 1, 5000, "purchase"),    # touch 2 is 4950s old > 3600 -> no
            r(5, 2, 0, "purchase"),       # no touch at all
            r(6, 2, 10, "click"),
            r(7, 2, 10, "view"),          # same ts: higher id wins
            r(8, 2, 10, "purchase"),      # same-ts touch attributable -> 7
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {
        row["conversion_id"]: row.asDict()
        for row in last_touch_attribution(
            ev, ["click", "view"], "purchase", lookback_sec=3600
        ).collect()
    }
    assert set(got) == {3, 4, 5, 8}
    assert got[3]["touch_event_id"] == 2 and got[3]["attributed"]
    assert got[3]["seconds_since_touch"] == 50.0
    assert got[3]["touch_type"] == "view"
    assert got[4]["touch_event_id"] is None and not got[4]["attributed"]
    assert got[5]["touch_event_id"] is None and not got[5]["attributed"]
    assert got[8]["touch_event_id"] == 7 and got[8]["seconds_since_touch"] == 0.0
    with pytest.raises(ValueError, match="lookback_sec"):
        last_touch_attribution(ev, ["click"], "purchase", lookback_sec=0)
    with pytest.raises(ValueError, match="touch type"):
        last_touch_attribution(ev, [], "purchase", lookback_sec=10)


def test_anomaly_mad_hand_checked(spark):
    """Modified z-score on a hand-sized group: the planted spike flags,
    the bulk does not; a constant group has MAD 0 -> NULL mod_z and no
    flags; the mean-dragging outlier that breaks zscore stays flagged
    under MAD."""
    import pytest

    from orientdb_spark.temporal import anomaly_mad

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 100])]
    rows += [(10 + i, "b", 7.0) for i in range(4)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r["event_id"]: r.asDict() for r in anomaly_mad(
        ev, on=["event_type"], threshold=3.5
    ).collect()}
    # group a: med 12.5, deviations [2.5,1.5,.5,.5,1.5,87.5] -> MAD 1.5
    assert got[0]["med"] == 12.5 and got[0]["mad"] == 1.5
    spike = got[5]
    assert spike["is_outlier"] and spike["mod_z"] == round(
        0.6745 * 87.5 / 1.5 + 1e-12, 6
    )
    assert not any(got[i]["is_outlier"] for i in range(5))
    # constant group: MAD 0 -> null mod_z, no flags
    assert got[10]["mad"] == 0.0 and got[10]["mod_z"] is None
    assert got[10]["is_outlier"] is False
    with pytest.raises(ValueError, match="key column"):
        anomaly_mad(ev, on=[])


def test_slo_burn_rate_hand_checked(spark):
    """Hand-computed burn rates on 1h windows at slo 0.99 (budget 0.01):
    a 20%-error window burns 20x (pages), a 10% window burns 10x
    (tickets only), a clean window burns 0."""
    import datetime as dt

    import pytest

    from pyspark.sql import functions as F

    from orientdb_spark.temporal import slo_burn_rate

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # window 0: 10 events, 2 errors; window 1: 10 events, 1 error;
    # window 2: 10 events, 0 errors
    for w, n_err in [(0, 2), (1, 1), (2, 0)]:
        for i in range(10):
            rows.append(
                (
                    w * 100 + i,
                    t0 + dt.timedelta(hours=w, minutes=i),
                    "error" if i < n_err else "ok",
                )
            )
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {
        r["window_start"].hour: r.asDict()
        for r in slo_burn_rate(
            ev, F.col("event_type") == "error", slo=0.99, window_sec=3600
        ).collect()
    }
    assert got[0]["n_errors"] == 2 and got[0]["error_rate"] == 0.2
    assert got[0]["burn_rate"] == round(0.2 / (1.0 - 0.99) + 1e-12, 6)
    assert got[0]["page_alert"] and got[0]["ticket_alert"]
    assert got[1]["burn_rate"] == round(0.1 / (1.0 - 0.99) + 1e-12, 6)
    assert not got[1]["page_alert"] and got[1]["ticket_alert"]
    assert got[2]["burn_rate"] == 0.0
    assert not got[2]["page_alert"] and not got[2]["ticket_alert"]
    with pytest.raises(ValueError, match="slo must be"):
        slo_burn_rate(ev, F.col("event_type") == "error", slo=1.0)
