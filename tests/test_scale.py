"""Scale utilities: salted aggregation/join equivalence + bucketed
co-located joins (shuffle-free plan verification)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_spark.scale import (
    bucketed_join_plan_is_shuffle_free,
    salted_aggregate,
    salted_join,
    write_bucketed,
)

from tests.conftest import SF_DIR


def test_salted_aggregate_matches_direct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("q"), F.count("l_orderkey").alias("n")
    )
    salted = salted_aggregate(
        li, ["l_returnflag"], {"q": ("l_quantity", "sum"), "n": ("l_orderkey", "count")}
    )
    assert direct.exceptAll(salted).count() == 0
    assert salted.exceptAll(direct).count() == 0


def test_salted_join_matches_direct(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_custkey")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    direct = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey").select("o_orderkey", "c_name")
    assert direct.exceptAll(salted).count() == 0
    assert salted.exceptAll(direct).count() == 0


def test_bucketed_join_is_shuffle_free(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed(orders, "orders_b", "o_custkey", n_buckets=8)
    write_bucketed(cust, "cust_b", "o_custkey", n_buckets=8)
    assert bucketed_join_plan_is_shuffle_free(spark, "orders_b", "cust_b", "o_custkey")
    # and the co-located join returns the same rows as the plain one
    a = spark.table("orders_b").join(spark.table("cust_b"), "o_custkey").count()
    b = orders.join(cust, "o_custkey").count()
    assert a == b


def test_key_partitioned_point_lookup_prunes(spark):
    import tempfile

    from orientdb_spark.scale import key_point_lookup, write_key_partitioned

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = tempfile.mkdtemp(prefix="ospark_part_") + "/orders_part"
    write_key_partitioned(orders, path, "o_orderkey", n_partitions=16)
    hit = key_point_lookup(spark, path, "o_orderkey", 42, n_partitions=16)
    assert hit.count() == 1
    plan = hit._jdf.queryExecution().executedPlan().toString()
    # the partition filter reached the scan: only the matching __kp
    # directory is read
    assert "PartitionFilters: [" in plan and "__kp" in plan.split("PartitionFilters")[1][:120]


def test_link_nav_big_target_not_forced_broadcast(spark):
    """VERDICT r1 item 3: a link navigation to a fact-sized target class
    must not force a broadcast hint — strategy belongs to AQE /
    autoBroadcastJoinThreshold (expressions.py _ensure_link_join). With
    the threshold dropped to 1KB a forced F.broadcast would still appear
    as BroadcastHashJoin; the unforced plan falls back to sort-merge."""
    from orientdb_spark import Engine

    eng = Engine(spark)
    eng.register_parquet_dir(SF_DIR)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1KB")
        df = eng.sql("select l_orderkey.o_orderdate from lineitem where l_linenumber = 1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_tpch_q6_filters_pushed_to_scan(spark):
    """The q6 shape must reach the parquet scan as PushedFilters with a
    pruned ReadSchema — the free wins of declaring the plan (brief:
    'a scan that reads all columns for a 2-column projection is wrong')."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["tpch_q6_forecast"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not an empty list
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters pushed to the parquet scan"
    # column pruning: the scan schema must not include every lineitem column
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_comment" not in read_schema


def test_mergeable_distinct_error_bound(spark):
    """Per-group HLL estimates and the union-merged TOTAL row must sit
    inside ~3x the lgk=12 HLL error bound of the exact counts, and the
    merged total must equal sketching the whole table directly (sketch
    algebra, not a second scan)."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import mergeable_distinct

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in mergeable_distinct(li, "l_partkey", ["l_returnflag"]).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    exact["__total__"] = li.select("l_partkey").distinct().count()
    assert set(out) == set(exact)
    for g, est in out.items():
        assert abs(est - exact[g]) / exact[g] < 0.05, (g, est, exact[g])
    direct = (
        li.agg(F.hll_sketch_agg(F.col("l_partkey"), F.lit(12)).alias("s"))
        .select(F.hll_sketch_estimate("s").cast("long").alias("v"))
        .first()["v"]
    )
    assert out["__total__"] == direct


def test_bloom_prefilter_join_matches_plain_join(spark):
    """Never a false negative: the Bloom-prefiltered join equals the
    plain join even with a tiny bitmap (high false-positive rate — the
    join re-check absorbs those)."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import bloom_prefilter_join

    fact = spark.range(0, 5000).select((F.col("id") % 613).alias("fk"), F.col("id").alias("v"))
    dim = spark.range(0, 40).select((F.col("id") * 11).alias("dk"), F.col("id").alias("dv"))
    for m_bits in (1 << 8, 1 << 14):  # 256 bits forces false positives
        got = bloom_prefilter_join(fact, dim, "fk", "dk", m_bits=m_bits, k=4)
        plain = fact.join(dim, fact["fk"] == dim["dk"])
        assert got.count() == plain.count(), m_bits
        assert sorted(r["v"] for r in got.collect()) == sorted(
            r["v"] for r in plain.collect()
        )


def test_bloom_prefilter_prunes_nonmatching_rows(spark):
    """The point of the operator: with an adequate bitmap, the fact rows
    that can't match never reach the join (here: exact semi-join
    selectivity, zero false positives at m/n = 800)."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import _bit_mask, _bloom_positions, bloom_filter_build

    fact = spark.range(0, 10000).select((F.col("id") % 997).alias("fk"))
    dim = spark.range(0, 20).select((F.col("id") * 7).alias("dk"))
    bitmap = bloom_filter_build(dim, "dk", m_bits=1 << 14, k=5)
    lit = F.lit(bitmap)
    pos = _bloom_positions(F.col("fk"), 5, 1 << 14)
    hit = F.forall(
        pos,
        lambda p: (
            F.element_at(lit, (p / 64).cast("int") + 1).bitwiseAND(_bit_mask(p % 64))
            != 0
        ),
    )
    kept = fact.filter(hit).count()
    true_matches = fact.join(dim, fact["fk"] == dim["dk"], "left_semi").count()
    assert kept < 1000, kept  # >90% of the 10k fact rows pruned pre-shuffle
    assert kept >= true_matches


def test_bloom_prefilter_adds_no_fact_side_exchange(spark):
    """The bitmap rides in as a literal — the fact side must show a plain
    Filter over the scan, no Exchange before the (broadcast) join."""
    import re

    from pyspark.sql import functions as F

    from orientdb_spark.scale import bloom_prefilter_join

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet").filter(
        F.col("s_nationkey") == 3
    )
    out = bloom_prefilter_join(li, sup, "l_suppkey", "s_suppkey", m_bits=1 << 16)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_shuffles = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))
    assert n_shuffles == 0, plan


def test_cms_never_underestimates_and_bounds_error(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.scale import cms_build, cms_estimate

    # zipf-ish: key i appears (200 // (i+1)) times
    rows = [(f"k{i}",) for i in range(50) for _ in range(200 // (i + 1))]
    df = spark.createDataFrame(rows, ["key"])
    n = len(rows)
    truth = {}
    for (k,) in rows:
        truth[k] = truth.get(k, 0) + 1
    sk = cms_build(df, "key", width=1024, depth=5)
    keys = df.select("key").distinct()
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(sk, keys, "key", width=1024, depth=5).collect()
    }
    assert set(est) == set(truth)
    eps_n = (2.718 / 1024) * n  # e/width * N
    for k, t in truth.items():
        assert est[k] >= t, f"{k} underestimated: {est[k]} < {t}"
        assert est[k] - t <= max(eps_n, 1), f"{k} over by {est[k] - t}"


def test_cms_merge_equals_direct_sketch(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.scale import cms_build, cms_merge

    df = spark.range(0, 3000).select((F.col("id") % 37).cast("string").alias("key"))
    a = df.filter(F.col("key").cast("int") % 2 == 0)
    b = df.filter(F.col("key").cast("int") % 2 == 1)
    merged = sorted(map(tuple, cms_merge(cms_build(a, "key"), cms_build(b, "key")).collect()))
    direct = sorted(map(tuple, cms_build(df, "key").collect()))
    assert merged == direct


def test_cms_heavy_hitters_exact_on_skewed_keys(spark):
    """For keys holding >> eps*N of the mass, the CMS estimate must be
    exact or near-exact — the heavy-hitter use case."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import cms_build, cms_estimate

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    truth = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    sk = cms_build(ev, "event_type", width=2048, depth=5)
    keys = ev.select("event_type").distinct()
    est = {r["event_type"]: r["est_count"] for r in
           cms_estimate(sk, keys, "event_type", width=2048, depth=5).collect()}
    assert est == truth  # few keys, wide sketch: collisions impossible


def test_cms_join_size_bounds_and_empty(spark):
    """The inner-product estimator never underestimates the true join
    cardinality and overshoots by at most eps*|A|*|B|; an empty side
    estimates 0."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import cms_build, cms_join_size

    rows_a = [(f"k{i}",) for i in range(40) for _ in range(120 // (i + 1))]
    rows_b = [(f"k{i}",) for i in range(10, 60) for _ in range(3)]
    da = spark.createDataFrame(rows_a, ["key"])
    db = spark.createDataFrame(rows_b, ["key"])
    ca, cb = {}, {}
    for (k,) in rows_a:
        ca[k] = ca.get(k, 0) + 1
    for (k,) in rows_b:
        cb[k] = cb.get(k, 0) + 1
    truth = sum(ca.get(k, 0) * cb.get(k, 0) for k in ca)
    sa = cms_build(da, "key", width=1024, depth=5)
    sb = cms_build(db, "key", width=1024, depth=5)
    est = cms_join_size(sa, sb, depth=5).collect()[0]["est_join_size"]
    assert est >= truth
    eps = 2.718 / 1024
    assert est - truth <= max(eps * len(rows_a) * len(rows_b), 1)
    # empty probe side -> every hash row's inner product is 0
    empty = cms_build(da.filter(F.lit(False)), "key", width=1024, depth=5)
    assert cms_join_size(sa, empty, depth=5).collect()[0]["est_join_size"] == 0


def test_key_skew_report_finds_hot_key_deterministically(spark):
    """A 60%-hot key is reported with its exact share; a tie on the max
    count picks the smallest value string (deterministic)."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import key_skew_report

    df = spark.range(0, 100).select(
        F.when(F.col("id") < 60, "hot").otherwise(F.col("id").cast("string")).alias("k"),
        (F.col("id") % 2).alias("tied"),
    )
    got = {r["column"]: r for r in key_skew_report(df, ["k", "tied"]).collect()}
    k = got["k"]
    assert (k["n_rows"], k["n_distinct"], k["top1_value"], k["top1_count"]) == (
        100, 41, "hot", 60,
    )
    assert abs(k["top1_share"] - 0.6) < 1e-12
    # 50/50 tie between "0" and "1" -> smallest string wins
    assert got["tied"]["top1_value"] == "0" and got["tied"]["top1_count"] == 50
    import pytest

    with pytest.raises(ValueError):
        key_skew_report(df, [])
    with pytest.raises(ValueError):
        key_skew_report(df, ["nope"])


def test_quantile_sketch_merge_identity_and_error(spark):
    """bottom-k identity: merging shard sketches equals sketching the
    union, exactly (deterministic hash ranks); the p50 estimate lands
    within sampling error of the exact median in rank terms."""
    from pyspark.sql import functions as F

    from orientdb_spark.scale import (
        quantile_sketch_build,
        quantile_sketch_estimate,
        quantile_sketch_merge,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    whole = quantile_sketch_build(ev, "value", "event_id", ["event_type"], b=64)
    a = quantile_sketch_build(
        ev.filter(F.col("event_id") % 3 == 0), "value", "event_id",
        ["event_type"], b=64,
    )
    bc = quantile_sketch_build(
        ev.filter(F.col("event_id") % 3 != 0), "value", "event_id",
        ["event_type"], b=64,
    )
    merged = quantile_sketch_merge(a, bc, b=64)
    w = {r["event_type"]: (r["n_rows"], r["ranks"], r["samples"])
         for r in whole.collect()}
    m = {r["event_type"]: (r["n_rows"], r["ranks"], r["samples"])
         for r in merged.collect()}
    assert w == m
    # rank-space error: the estimated median's rank among the TRUE
    # values stays within ~3.4 sigma = 0.5 +- 3.4*sqrt(.25/64)
    est = {
        r["event_type"]: r["q_0_5"]
        for r in quantile_sketch_estimate(whole, [0.5]).collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for et, q in est.items():
        xs = sorted(vals[et])
        frac = sum(v <= q for v in xs) / len(xs)
        assert abs(frac - 0.5) < 0.22, (et, frac)
    import pytest

    with pytest.raises(ValueError):
        quantile_sketch_build(ev, "value", "event_id", b=1)
    with pytest.raises(ValueError):
        quantile_sketch_estimate(whole, [])


# --- z-order layout key -------------------------------------------------------


def test_zorder_interleave_roundtrip(spark):
    """zkey deinterleaves back to the exact per-dimension grid cells
    (numpy replay of the min-max grid), and close points share key
    prefixes: the locality property range-partitioning relies on."""
    from pyspark.sql import functions as F

    from orientdb_spark import scale

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = scale.zorder_key(ev, ["user_id", "value"], bits_per_dim=8)
    rows = out.select("event_id", "user_id", "value", "zkey").collect()
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    mn0, mx0, mn1, mx1 = (float(x) for x in stats)
    import math
    for r in rows[:200]:
        c0 = int(math.floor((float(r["user_id"]) - mn0) / (mx0 - mn0) * 255.0))
        c1 = int(math.floor((float(r["value"]) - mn1) / (mx1 - mn1) * 255.0))
        d0 = d1 = 0
        for b in range(8):
            d0 |= ((r["zkey"] >> (2 * b)) & 1) << b
            d1 |= ((r["zkey"] >> (2 * b + 1)) & 1) << b
        assert (d0, d1) == (c0, c1), (r, c0, c1, d0, d1)


def test_zorder_nulls_and_constant_dims(spark):
    from orientdb_spark import scale

    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, None, 2.0), (3, 9.0, 3.0)],
        ["id", "a", "b"],
    )
    rows = {r["id"]: r["zkey"] for r in scale.zorder_key(df, ["a", "b"]).collect()}
    assert rows[2] is not None  # null dim -> cell 0, key still defined
    const = spark.createDataFrame([(1, 7.0, 1.0), (2, 7.0, 2.0)], ["id", "a", "b"])
    got = {r["id"]: r["zkey"] for r in scale.zorder_key(const, ["a", "b"]).collect()}
    # constant dim contributes 0 bits; the other dim still orders keys
    assert got[1] < got[2]


def test_zorder_validation(spark):
    import pytest

    from orientdb_spark import scale

    df = spark.createDataFrame([(1, 1.0)], ["id", "a"])
    with pytest.raises(ValueError, match="at least one"):
        scale.zorder_key(df, [])
    with pytest.raises(ValueError, match="bits_per_dim"):
        scale.zorder_key(df, ["a"], bits_per_dim=0)
    with pytest.raises(ValueError, match="60-bit"):
        scale.zorder_key(df, ["a"] * 4, bits_per_dim=16)


# --- incremental additive rollup maintenance ---------------------------------


def test_merge_additive_rollup_identity(spark):
    """merge(agg(base), agg(delta)) == agg(base UNION delta) exactly for
    integer adds; groups present on only one side survive via coalesce."""
    from pyspark.sql import functions as F

    from orientdb_spark import scale

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def agg(d):
        return d.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("long")).alias("sv"),
        )

    base = ev.filter(F.col("event_id") % 7 != 0)
    delta = ev.filter(F.col("event_id") % 7 == 0)
    merged = scale.merge_additive_rollup(
        agg(base), agg(delta), ["event_type"], ["n", "sv"]
    )
    full = agg(ev)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_merge_additive_rollup_one_sided_groups(spark):
    from orientdb_spark import scale

    cube = spark.createDataFrame([("a", 10), ("b", 5)], ["k", "n"])
    delta = spark.createDataFrame([("b", 2), ("c", 7)], ["k", "n"])
    got = {r["k"]: r["n"]
           for r in scale.merge_additive_rollup(cube, delta, ["k"], ["n"]).collect()}
    assert got == {"a": 10, "b": 7, "c": 7}
    import pytest
    with pytest.raises(ValueError, match="keys and add_cols"):
        scale.merge_additive_rollup(cube, delta, [], ["n"])


def test_merge_additive_rollup_null_keys(spark):
    """NULL group keys (legit groupBy output) must MERGE, not duplicate
    — the null-safe-equality clause of the maintenance identity."""
    from orientdb_spark import scale

    cube = spark.createDataFrame([("a", 10), (None, 5)], ["k", "n"])
    delta = spark.createDataFrame([(None, 2), ("a", 1)], ["k", "n"])
    rows = scale.merge_additive_rollup(cube, delta, ["k"], ["n"]).collect()
    got = {r["k"]: r["n"] for r in rows}
    assert len(rows) == 2 and got == {"a": 11, None: 7}


def test_merge_additive_rollup_null_aggregates(spark):
    """SUM over an all-NULL group is NULL, and the identity must
    reproduce it: NULL merged with NULL stays NULL (whether the other
    side's row is absent or its sum is NULL); NULL merged with a value
    behaves as the full recompute does (SUM ignores NULLs)."""
    from orientdb_spark import scale

    cube = spark.createDataFrame(
        [("a", None), ("b", None), ("c", 3)], "k STRING, s LONG"
    )
    delta = spark.createDataFrame(
        [("b", None), ("c", None), ("d", 4), ("a", 2)], "k STRING, s LONG"
    )
    got = {r["k"]: r["s"]
           for r in scale.merge_additive_rollup(cube, delta, ["k"], ["s"]).collect()}
    # full recompute of SUM(s) per k over the union of contributions:
    # a: NULL+2=2, b: NULL+NULL=NULL, c: 3+NULL=3, d: 4
    assert got == {"a": 2, "b": None, "c": 3, "d": 4}


def test_compaction_plan_nfd_semantics(spark):
    """Next-fit-decreasing invariants: oversized files keep with
    bin -1, bins accumulate >= target before the next opens,
    single-file bins degrade to keep, partitions pack independently."""
    import pytest

    from orientdb_spark.scale import compaction_plan

    rows = [("p1", f"f{i:02d}", s) for i, s in enumerate(
        [900, 500, 400, 300, 200, 100, 50, 1500]
    )] + [("p2", "g1", 600), ("p2", "g2", 30), ("p3", "h1", 10)]
    df = spark.createDataFrame(rows, "part string, file_id string, size_bytes long")
    got = {
        r["file_id"]: r.asDict()
        for r in compaction_plan(df, 1000, partition_cols=["part"]).collect()
    }
    assert got["f07"]["action"] == "keep" and got["f07"]["bin_id"] == -1
    # 900+500 cross the target -> bin 0 closes; 400+300 -> bin 1
    assert got["f00"]["bin_id"] == 0 and got["f01"]["bin_id"] == 0
    assert got["f02"]["bin_id"] == 1 and got["f03"]["bin_id"] == 1
    assert got["f04"]["bin_id"] == 2 and got["f06"]["bin_id"] == 2
    assert got["f00"]["bin_bytes"] == 1400 and got["f00"]["action"] == "compact"
    # p2 packs separately from p1
    assert got["g1"]["bin_id"] == 0 and got["g1"]["n_bin_files"] == 2
    # a lone small file is a single-file bin -> nothing to merge
    assert got["h1"]["action"] == "keep" and got["h1"]["bin_id"] == 0
    # every non-final bin within a partition holds >= target input
    p1_bins = {}
    for r in got.values():
        if r["part"] == "p1" and r["bin_id"] >= 0:
            p1_bins[r["bin_id"]] = r["bin_bytes"]
    for b, total in p1_bins.items():
        if b < max(p1_bins):
            assert total >= 1000 * 0.7  # NFD: bounded undershoot only on close
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, 0)


def test_compaction_plan_single_exchange(spark):
    """Scale contract: both windows key on the partition columns, so
    the whole plan carries ONE hash exchange (the bin window reuses
    the pack window's partitioning) and no global funnel."""
    from orientdb_spark.scale import compaction_plan

    df = spark.range(200).selectExpr(
        "cast(id % 7 as string) as part",
        "cast(id as string) as file_id",
        "(id * 37) % 900 + 10 as size_bytes",
    )
    plan = (
        compaction_plan(df, 1000, partition_cols=["part"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "SinglePartition" not in plan, plan


def test_zone_map_audit_skip_decisions(spark):
    """min/max zone maps per file; skip fires on disjoint-above,
    disjoint-below, and all-null files; overlapping files scan; no
    predicate means no skipping."""
    from orientdb_spark import scale

    rows = [
        (1, 10), (1, 20),          # file 1: [10,20] — above hi=5 -> skip
        (2, 1), (2, 4),            # file 2: [1,4] overlaps [2,5] -> scan
        (3, None), (3, None),      # file 3: all null -> skip
        (4, 0), (4, 1),            # file 4: [0,1] — below lo=2 -> skip
    ]
    df = spark.createDataFrame(rows, "f long, v long")
    got = {
        r["file_id"]: r.asDict()
        for r in scale.zone_map_audit(df, "f", "v", pred_lo=2, pred_hi=5).collect()
    }
    assert got[1]["can_skip"] and got[4]["can_skip"]
    assert got[3]["can_skip"] and got[3]["n_nonnull"] == 0
    assert not got[2]["can_skip"]
    assert got[1]["min_value"] == 10 and got[1]["max_value"] == 20
    # one-sided bound: only lo -> file 1 scans, file 4 skips
    got_lo = {
        r["file_id"]: r["can_skip"]
        for r in scale.zone_map_audit(df, "f", "v", pred_lo=2).collect()
    }
    assert got_lo == {1: False, 2: False, 3: True, 4: True}
    # no predicate: nothing skips
    got_none = {
        r["file_id"]: r["can_skip"]
        for r in scale.zone_map_audit(df, "f", "v").collect()
    }
    assert got_none == {1: False, 2: False, 3: False, 4: False}
