"""Deep-graph traversal (the reference's 100-deep linear fixture,
tests:database/auto/GraphTestFixedDensity.java:28-128) and real
Structured Streaming execution of the batch/stream-agnostic transforms.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from orientdb_spark import Engine
from orientdb_spark.graph import Graph
from orientdb_spark.streaming import (
    fix_event_nanos,
    read_event_stream,
    windowed_event_counts,
)

from tests.conftest import SF_DIR

DEPTH = 100


@pytest.fixture(scope="module")
def chain_graph(spark):
    """Linear graph of DEPTH+1 vertices: v0 -> v1 -> ... -> v100."""
    vertices = spark.range(DEPTH + 1).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("vid")
    )
    edges = spark.range(DEPTH).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("v"), (F.col("id") + 1).cast("string")).alias("dst"),
        F.lit("next").alias("label"),
    )
    return Graph(vertices, edges)


def test_bfs_traverses_100_deep_chain(spark, chain_graph):
    # iterative frontier loop with checkpointing must survive 100 rounds
    # without lineage blow-up (SURVEY §7 hard part 3)
    reached = chain_graph.bfs(
        spark.createDataFrame([("v0",)], ["vid"]), max_depth=DEPTH
    )
    assert reached.count() == DEPTH + 1
    deepest = reached.filter(F.col("vid") == f"v{DEPTH}").collect()
    assert deepest and deepest[0]["depth"] == DEPTH


def test_traverse_predicate_deep_chain(spark):
    # SQL TRAVERSE over a self-linked class: which records reach v100
    # within 3 hops (OQueryOperatorTraverse depth-window semantics)
    eng = Engine(spark)
    rows = [(i, i + 1 if i < DEPTH else None) for i in range(DEPTH + 1)]
    df = spark.createDataFrame(rows, "id long, next long")
    eng.register_dataframe(
        "chain", df, rid_pos=lambda d: F.col("id"),
        links={"next": ("chain", "id")},
    )
    out = eng.query(
        f"select id from chain where any() traverse(0, 3) (id = {DEPTH}) order by id"
    )
    assert [r["id"] for r in out] == [DEPTH - 3, DEPTH - 2, DEPTH - 1, DEPTH]


def test_windowed_counts_streaming_matches_batch(spark):
    # events.parquet stores TIMESTAMP(NANOS) — normalize across pyspark
    # versions, as Engine.register_parquet_dir does (4.0: nanos-as-long
    # conf + convert; 4.1+: native TIMESTAMP_NTZ, no conversion)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="ospark_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_stream_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        assert stream.isStreaming
        agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_counts")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from win_counts")
        expected = windowed_event_counts(events, "1 hour")
        assert got.count() == expected.count()
        assert got.exceptAll(expected).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_session_window_stream_matches_batch_sessionize(spark):
    from orientdb_spark.streaming import sessionize, sessionize_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="ospark_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_sess_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        q = (
            sessionize_stream(stream, gap="30 minutes")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sessions")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from sessions")
        batch = sessionize(events, gap_minutes=30)
        # identical session structure: same per-user session count and the
        # same total event count per user
        g = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
        )
        b = batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
        )
        assert g.exceptAll(b).count() == 0 and b.exceptAll(g).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_graph_crud_link_unlink_neighbors(spark):
    from orientdb_spark.graph import Graph

    v = spark.createDataFrame([("a",), ("b",), ("c",)], ["vid"])
    e = spark.createDataFrame([("a", "b", "knows")], ["src", "dst", "label"])
    g = Graph(v, e)
    g2 = g.link("a", "c", "knows")
    assert g2.out_degrees().filter(F.col("vid") == "a").first()["out_degree"] == 2
    assert sorted(r["vid"] for r in g2.out_neighbors("a").collect()) == ["b", "c"]
    g3 = g2.unlink("a", "b")
    assert g3.in_degrees().filter(F.col("vid") == "b").count() == 0
    assert g3.out_edges("a").count() == 1


def test_first_seen_stream_matches_batch(spark):
    """applyInPandasWithState first-seen dedup: the streaming stateful
    operator must agree with the batch row_number formulation when the
    whole input arrives (availableNow)."""
    from orientdb_spark.streaming import first_seen, first_seen_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="ospark_fs_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_fs_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        dedup = first_seen_stream(stream, key_cols=("user_id", "event_type"))
        assert dedup.isStreaming
        q = (
            dedup.writeStream.outputMode("append")
            .format("memory")
            .queryName("first_seen_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from first_seen_rows")
        batch = first_seen(events, key_cols=("user_id", "event_type"))
        assert got.count() == batch.count()
        cols = [c for c in batch.columns]
        assert got.select(cols).exceptAll(batch.select(cols)).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_first_seen_ttl_readmits_by_event_time(spark):
    """With state_ttl, a key re-emits once the gap from the window-opening
    event exceeds the TTL — multiple windows inside one batch included."""
    import datetime as dt

    from orientdb_spark.streaming import first_seen_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # key (1, 'click'): emits at 00:00, suppressed at 00:30, re-emits
        # at 03:00 (ttl 1h), suppressed at 03:30
        (100, t0, 1, "click", 1.0, None),
        (101, t0 + dt.timedelta(minutes=30), 1, "click", 2.0, None),
        (102, t0 + dt.timedelta(hours=3), 1, "click", 3.0, None),
        (103, t0 + dt.timedelta(hours=3, minutes=30), 1, "click", 4.0, None),
        # key (2, 'view'): single event
        (200, t0, 2, "view", 9.0, None),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    got = first_seen_stream(events, state_ttl="1 hour")  # batch TTL path
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [100, 102, 200]

    # streaming path, one batch through the file source
    src_dir = tempfile.mkdtemp(prefix="ospark_ttl_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_ttl_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        q = (
            first_seen_stream(stream, state_ttl="1 hour")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("ttl_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        sids = sorted(
            r["event_id"] for r in spark.sql("select * from ttl_rows").collect()
        )
        assert sids == [100, 102, 200]
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_asof_join_stream_matches_batch(spark):
    """Streaming as-of join (applyInPandasWithState) must agree with the
    batch union+window formulation when the whole input arrives as one
    availableNow batch (per-key event-time order holds trivially)."""
    from orientdb_spark.streaming import asof_join_stream
    from orientdb_spark.temporal import asof_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    err_b = events.filter(F.col("event_type") == "error")
    clk_b = events.filter(F.col("event_type") == "click")
    src_dir = tempfile.mkdtemp(prefix="ospark_asof_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_asof_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        out = asof_join_stream(
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") == "click"),
            on=("user_id",),
            payload=("event_id", "value"),
        )
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("asof_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select event_id, user_id, prev_event_id, round(prev_value, 4) as pv "
            "from asof_rows"
        )
        batch = asof_join(
            err_b, clk_b, on=["user_id"], payload=("event_id", "value")
        ).select(
            "event_id", "user_id", "prev_event_id",
            F.round("prev_value", 4).alias("pv"),
        )
        assert got.count() == batch.count()
        assert got.exceptAll(batch).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_asof_join_stream_static_fallback(spark):
    from orientdb_spark.streaming import asof_join_stream

    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    out = asof_join_stream(
        events.filter(F.col("event_type") == "error"),
        events.filter(F.col("event_type") == "click"),
        on=("user_id",),
    )
    assert not out.isStreaming
    assert out.count() == events.filter(F.col("event_type") == "error").count()


def test_range_join_stream_matches_batch(spark):
    """Watermarked stream-stream range join: pair counts must equal the
    batch range_join_count when the whole input arrives availableNow."""
    from orientdb_spark.streaming import range_join_stream
    from orientdb_spark.temporal import range_join_count

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    err_b = events.filter(F.col("event_type") == "error")
    clk_b = events.filter(F.col("event_type") == "click")
    src_dir = tempfile.mkdtemp(prefix="ospark_rjs_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_rjs_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        pairs = range_join_stream(
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") == "click"),
            on="user_id",
            window_sec=1800,
        )
        assert pairs.isStreaming
        q = (
            pairs.writeStream.outputMode("append")
            .format("memory")
            .queryName("rjs_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select event_id, count(r_event_id) as n from rjs_rows group by event_id"
        )
        batch = range_join_count(
            err_b, clk_b, on=["user_id"], left_id="event_id", window_sec=1800
        ).filter(F.col("n_in_window") > 0).select(
            "event_id", F.col("n_in_window").alias("n")
        )
        assert got.count() == batch.count()
        assert got.exceptAll(batch).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_range_join_stream_static_input(spark):
    """On static frames the same operator is an ordinary equi+range
    join, pair-equal to the binned counter."""
    from orientdb_spark.streaming import range_join_stream
    from orientdb_spark.temporal import range_join_count

    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    err_b = events.filter(F.col("event_type") == "error")
    clk_b = events.filter(F.col("event_type") == "click")
    pairs = range_join_stream(err_b, clk_b, on="user_id", window_sec=1800)
    got = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n"))
    batch = range_join_count(
        err_b, clk_b, on=["user_id"], left_id="event_id", window_sec=1800
    ).filter(F.col("n_in_window") > 0).select(
        "event_id", F.col("n_in_window").alias("n")
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_asof_join_stream_state_across_batches(spark):
    """Force two micro-batches split on event time (one file per
    trigger): a left event in batch 2 must match a right event that
    arrived in batch 1 purely through GroupState."""
    import datetime as dt

    from orientdb_spark.streaming import asof_join_stream

    src_dir = tempfile.mkdtemp(prefix="ospark_asof2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_asof2_ckpt_")
    try:
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
        early = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.5)], schema
        )
        late = spark.createDataFrame(
            [(2, dt.datetime(2024, 1, 1, 11, 0), 7, "error", 0.0)], schema
        )
        # two files written separately -> maxFilesPerTrigger=1 yields two
        # ordered micro-batches (file mtime order == write order here)
        early.coalesce(1).write.parquet(src_dir + "/f0")
        late.coalesce(1).write.parquet(src_dir + "/f1")
        stream = (
            spark.readStream.schema(spark.read.parquet(src_dir + "/f0").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/f*")
        )
        out = asof_join_stream(
            stream.filter(F.col("event_type") == "error"),
            stream.filter(F.col("event_type") == "click"),
            on=("user_id",),
            payload=("event_id", "value"),
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("asof2_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from asof2_rows").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["event_id"] == 2 and r["prev_event_id"] == 1 and r["prev_value"] == 1.5
        # the run really split into multiple batches
        assert len(q.recentProgress) >= 2
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_first_seen_stream_suppresses_across_batches(spark):
    """The dedup claim that matters: a duplicate key arriving in a LATER
    micro-batch must be suppressed by state carried from the first."""
    import datetime as dt

    from orientdb_spark.streaming import first_seen_stream

    src_dir = tempfile.mkdtemp(prefix="ospark_fs2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_fs2_ckpt_")
    try:
        schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
        b1 = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0)], schema
        )
        b2 = spark.createDataFrame(
            [
                (2, dt.datetime(2024, 1, 1, 11, 0), 7, "click", 2.0),   # dup key
                (3, dt.datetime(2024, 1, 1, 11, 0), 8, "view", 3.0),    # new key
            ],
            schema,
        )
        b1.coalesce(1).write.parquet(src_dir + "/f0")
        b2.coalesce(1).write.parquet(src_dir + "/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/f*")
        )
        out = first_seen_stream(stream, key_cols=("user_id", "event_type"))
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("fs2_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = {r["event_id"] for r in spark.sql("select * from fs2_rows").collect()}
        assert got == {1, 3}  # event 2 suppressed by cross-batch state
        assert len(q.recentProgress) >= 2
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_gap_fill_stream_matches_batch_minus_open_bucket(spark):
    """Streaming gap-fill (emit-on-close) over one availableNow pass
    must equal batch gap_fill minus each key's final (still-open)
    bucket — gaps included, carries identical."""
    from orientdb_spark.streaming import gap_fill_stream
    from orientdb_spark.temporal import gap_fill

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="ospark_gf_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_gf_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        out = gap_fill_stream(stream, on=("user_id",), step_sec=21600)
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("gf_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select user_id, bucket_ts, n_obs, round(value, 6) as v, is_gap "
            "from gf_rows"
        )
        batch = gap_fill(events, on=["user_id"], step_sec=21600)
        from pyspark.sql import Window

        last = Window.partitionBy("user_id")
        closed = (
            batch.withColumn("__mx", F.max("bucket_ts").over(last))
            .filter(F.col("bucket_ts") < F.col("__mx"))
            .select(
                "user_id", "bucket_ts", "n_obs",
                F.round("value", 6).alias("v"), "is_gap",
            )
        )
        assert got.count() == closed.count()
        assert got.exceptAll(closed).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_gap_fill_stream_state_carries_across_batches(spark):
    """A gap spanning two micro-batches must still be filled: the open
    bucket and carry live in GroupState, not in the batch."""
    import datetime as dt

    from orientdb_spark.streaming import gap_fill_stream

    src_dir = tempfile.mkdtemp(prefix="ospark_gf2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_gf2_ckpt_")
    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    schema = "user_id bigint, ts timestamp, value double"
    try:
        # two files -> maxFilesPerTrigger=1 gives two ordered
        # micro-batches inside ONE availableNow query (same harness as
        # the as-of cross-batch test)
        b1 = spark.createDataFrame([(7, t0, 10.0)], schema)
        b2 = spark.createDataFrame([(7, t0 + dt.timedelta(hours=3), 40.0)], schema)
        b1.coalesce(1).write.parquet(src_dir + "/f0")
        b2.coalesce(1).write.parquet(src_dir + "/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/f*")
        )
        out = gap_fill_stream(stream, on=("user_id",), step_sec=3600)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("gf2_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(60)
        rows = sorted(
            (r["bucket_ts"].hour, r["n_obs"], r["value"], r["is_gap"])
            for r in spark.sql("select * from gf2_rows").collect()
        )
        # bucket 0 closed by the batch-2 event; 2 gap rows carry 10.0
        assert rows == [(0, 1, 10.0, False), (1, 0, 10.0, True), (2, 0, 10.0, True)]
        assert len(q.recentProgress) >= 2
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_gap_fill_stream_static_fallback(spark):
    from orientdb_spark.streaming import gap_fill_stream

    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    out = gap_fill_stream(events, on=("user_id",), step_sec=21600)
    assert not out.isStreaming and out.count() > 0


def test_scd2_stream_matches_batch_closed_intervals(spark):
    """Streaming SCD2 (emit-on-close) over one availableNow pass must
    equal batch scd2_intervals restricted to CLOSED intervals —
    versions, bounds, and attrs identical."""
    from orientdb_spark.streaming import scd2_stream
    from orientdb_spark.temporal import scd2_intervals

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="ospark_scd2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_scd2_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        out = scd2_stream(read_event_stream(spark, src_dir))
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("scd2_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select user_id, event_type, valid_from, valid_to, version from scd2_rows"
        )
        batch = (
            scd2_intervals(events, key="user_id", attrs=["event_type"])
            .filter(F.col("valid_to").isNotNull())
            .select("user_id", "event_type", "valid_from", "valid_to", "version")
        )
        assert got.count() == batch.count()
        assert got.exceptAll(batch).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_scd2_stream_state_across_batches(spark):
    """An interval opened in batch 1 must close from a change arriving
    in batch 2 — purely through GroupState."""
    import datetime as dt

    from orientdb_spark.streaming import scd2_stream

    src_dir = tempfile.mkdtemp(prefix="ospark_scd22_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_scd22_ckpt_")
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    schema = "user_id bigint, ts timestamp, event_type string"
    try:
        b1 = spark.createDataFrame([(7, t0, "A"), (7, t0 + dt.timedelta(hours=1), "A")], schema)
        b2 = spark.createDataFrame([(7, t0 + dt.timedelta(hours=2), "B")], schema)
        b1.coalesce(1).write.parquet(src_dir + "/f0")
        b2.coalesce(1).write.parquet(src_dir + "/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/f*")
        )
        q = (
            scd2_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("scd22_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(60)
        rows = spark.sql("select * from scd22_rows").collect()
        assert len(rows) == 1
        r = rows[0]
        # interval opened at t0 (batch 1, duplicate 'A' extends it),
        # closed by 'B' at t0+2h arriving in batch 2
        assert r["event_type"] == "A" and r["version"] == 1
        assert r["valid_from"] == t0 and r["valid_to"] == t0 + dt.timedelta(hours=2)
        assert len(q.recentProgress) >= 2
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_scd2_stream_static_fallback(spark):
    from orientdb_spark.streaming import scd2_stream

    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    out = scd2_stream(events)
    assert not out.isStreaming and out.count() > 0


def test_anomaly_zscore_stream_matches_batch(spark):
    """Streaming rolling z-score (fifth stateful operator) must agree
    with temporal.anomaly_zscore when the whole input arrives as one
    availableNow batch."""
    from orientdb_spark.streaming import anomaly_zscore_stream
    from orientdb_spark.temporal import anomaly_zscore

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="ospark_az_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_az_ckpt_")
    try:
        events.write.mode("overwrite").parquet(src_dir)
        stream = read_event_stream(spark, src_dir)
        out = anomaly_zscore_stream(
            stream, on=("user_id",), window_sec=86400, z_threshold=2.0
        )
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("az_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select event_id, round(rolling_mean, 6) as m, "
            "round(rolling_std, 6) as s, zscore, is_anomaly from az_rows"
        )
        batch = anomaly_zscore(
            events, on=["user_id"], window_sec=86400, z_threshold=2.0
        ).select(
            "event_id",
            F.round("rolling_mean", 6).alias("m"),
            F.round("rolling_std", 6).alias("s"),
            "zscore",
            "is_anomaly",
        )
        assert got.count() == batch.count()
        assert got.exceptAll(batch).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_anomaly_zscore_stream_state_across_batches(spark):
    """The window buffer must survive micro-batch boundaries: feeding
    the same key in two file-batches equals one batch (per-key
    event-time order holds across the split)."""
    import datetime as dt

    from orientdb_spark.streaming import anomaly_zscore_stream

    def _rows(lo, hi):
        base = dt.datetime(2024, 1, 1, 12, 0)
        return [
            ("u1", base + dt.timedelta(minutes=i), 10.0 + (i % 2) if i < 9 else 100.0)
            for i in range(lo, hi)
        ]

    src_dir = tempfile.mkdtemp(prefix="ospark_az2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_az2_ckpt_")
    try:
        schema = "k STRING, ts TIMESTAMP, value DOUBLE"
        # one FILE per micro-batch with ordered mtimes — multi-part
        # writes would let the source split/reorder rows mid-key
        import time

        spark.createDataFrame(_rows(0, 5), schema).coalesce(1).write.parquet(
            f"{src_dir}/b1"
        )
        time.sleep(1.1)
        spark.createDataFrame(_rows(5, 10), schema).coalesce(1).write.parquet(
            f"{src_dir}/b2"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{src_dir}/*")
        )
        out = anomaly_zscore_stream(
            stream, on=("k",), ts_col="ts", value_col="value",
            window_sec=3600, z_threshold=2.5,
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("az2_rows")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = {
            r["ts"]: (r["zscore"], r["is_anomaly"])
            for r in spark.sql("select * from az2_rows").collect()
        }
        assert len(rows) == 10
        # last row (the spike) sees the full 10-row window even though
        # the first 5 rows arrived in an earlier micro-batch
        spike_ts = max(rows)
        z, flag = rows[spike_ts]
        assert z is not None and z > 2.5 and flag is True
        assert sum(1 for z_, f_ in rows.values() if f_ is True) == 1
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_anomaly_zscore_stream_static_fallback(spark):
    from orientdb_spark.streaming import anomaly_zscore_stream

    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    out = anomaly_zscore_stream(events, on=("user_id",))
    assert not out.isStreaming
    assert out.count() == events.count()


def test_cusum_stream_matches_batch(spark):
    """Streaming CUSUM (sixth stateful operator) equals the batch
    operator with the same explicit target/scale when the input arrives
    availableNow."""
    import datetime as dt
    import random

    from orientdb_spark.streaming import cusum_stream
    from orientdb_spark.temporal import cusum_changepoints

    rng = random.Random(9)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for k in ("a", "b"):
        shift = 80 if k == "a" else 10_000
        for i in range(160):
            rows.append(
                (k, base + dt.timedelta(minutes=i),
                 rng.gauss(0 if i < shift else -2.5, 1))
            )
    schema = "k STRING, ts TIMESTAMP, value DOUBLE"
    df = spark.createDataFrame(rows, schema)
    src_dir = tempfile.mkdtemp(prefix="ospark_cusum_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_cusum_ckpt_")
    try:
        df.coalesce(1).write.parquet(src_dir + "/b1")
        stream = spark.readStream.schema(schema).parquet(src_dir + "/*")
        out = cusum_stream(stream, on=("k",), target=0.0, scale=1.0)
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("cusum_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["k"], r["ts"], r["direction"], round(r["statistic"], 9))
            for r in spark.sql("select * from cusum_rows").collect()
        }
        batch = {
            (r["k"], r["ts"], r["direction"], round(r["statistic"], 9))
            for r in cusum_changepoints(
                df, on=["k"], target=0.0, scale=1.0
            ).collect()
        }
        assert got == batch and got
        assert all(d == "down" for (_, _, d, _) in got)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_cusum_stream_state_across_batches(spark):
    """The (S+, S-) sums survive micro-batch boundaries: a drift split
    across two file-batches still alarms, at the same point as one
    batch."""
    import datetime as dt

    from orientdb_spark.streaming import cusum_stream
    from orientdb_spark.temporal import cusum_changepoints

    base = dt.datetime(2024, 1, 1)
    # steady +1 sigma drift: S+ grows by 0.5 per sample, alarm ~sample 11
    rows = [("u", base + dt.timedelta(minutes=i), 1.0) for i in range(16)]
    schema = "k STRING, ts TIMESTAMP, value DOUBLE"
    src_dir = tempfile.mkdtemp(prefix="ospark_cusum2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_cusum2_ckpt_")
    try:
        import time

        spark.createDataFrame(rows[:8], schema).coalesce(1).write.parquet(
            src_dir + "/b1"
        )
        time.sleep(1.1)
        spark.createDataFrame(rows[8:], schema).coalesce(1).write.parquet(
            src_dir + "/b2"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src_dir + "/*")
        )
        out = cusum_stream(stream, on=("k",), target=0.0, scale=1.0)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("cusum2_rows")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = sorted(
            (r["ts"], r["direction"])
            for r in spark.sql("select * from cusum2_rows").collect()
        )
        want = sorted(
            (r["ts"], r["direction"])
            for r in cusum_changepoints(
                spark.createDataFrame(rows, schema),
                on=["k"], target=0.0, scale=1.0,
            ).collect()
        )
        assert got == want and got
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_silence_alerts_event_time_timeout(spark):
    """Seventh stateful operator, the timeout-driven one: key A goes
    silent after batch 1; batch 2 (other keys) advances the watermark
    past A's deadline and the alert fires WITHOUT any A event; a key
    that keeps talking never alerts."""
    import datetime as dt
    import time

    from orientdb_spark.streaming import silence_alerts_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "k STRING, ts TIMESTAMP, value DOUBLE"
    src_dir = tempfile.mkdtemp(prefix="ospark_sil_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_sil_ckpt_")
    try:
        b1 = [("A", t0, 1.0), ("B", t0, 1.0)]
        b2 = [("B", t0 + dt.timedelta(hours=2), 1.0)]
        b3 = [("C", t0 + dt.timedelta(hours=4), 1.0)]
        for i, rows in enumerate((b1, b2, b3), 1):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}"
            )
            time.sleep(1.1)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{src_dir}/*")
        )
        out = silence_alerts_stream(
            stream, on=("k",), silence="1 hour", watermark="0 seconds"
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sil_rows")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r["k"]: (r["last_seen"], r["deadline"])
            for r in spark.sql("select * from sil_rows").collect()
        }
        # A alerted (silent since t0, deadline t0+1h); B alerted for its
        # second silence window once batch 3 advanced the watermark past
        # t0+3h; C's deadline was never passed by any later watermark
        assert "A" in got and got["A"] == (t0, t0 + dt.timedelta(hours=1))
        assert "C" not in got
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_silence_alerts_batch_fallback(spark):
    import datetime as dt

    from orientdb_spark.streaming import silence_alerts_stream

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("A", t0, 1.0), ("B", t0 + dt.timedelta(hours=3), 1.0)],
        "k STRING, ts TIMESTAMP, value DOUBLE",
    )
    out = silence_alerts_stream(df, on=("k",), silence="1 hour")
    got = {r["k"]: r["deadline"] for r in out.collect()}
    assert got == {"A": t0 + dt.timedelta(hours=1)}


def test_near_dup_stream_matches_batch(spark):
    """Streaming MinHash near-dup detection must agree with the batch
    applyInPandas formulation when the whole corpus arrives as one
    availableNow batch, and must find every planted recrawl copy."""
    from orientdb_spark.streaming import near_dup_pairs_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    recrawl = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = (
        docs.select("doc_id", "text")
        .unionByName(recrawl)
        .withColumn("ts", F.timestamp_seconds(F.col("doc_id") % 1000000))
    )
    batch = near_dup_pairs_stream(corpus, threshold=0.7)
    brows = {
        (r["doc_id"], r["dup_of"], r["band"], r["est_jaccard"])
        for r in batch.collect()
    }
    exact = {(d, o) for d, o, _, e in brows if e == 1.0 and d == o + 1000000}
    assert len(exact) == 100  # every planted recrawl found
    src_dir = tempfile.mkdtemp(prefix="ospark_nd_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_nd_ckpt_")
    try:
        corpus.coalesce(1).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(corpus.schema).parquet(src_dir)
        out = near_dup_pairs_stream(stream, threshold=0.7)
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("nd_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(180)
        srows = {
            (r["doc_id"], r["dup_of"], r["band"], r["est_jaccard"])
            for r in spark.sql("select * from nd_rows").collect()
        }
        assert srows == brows
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_near_dup_stream_probes_state_across_batches(spark):
    """The ingest-dedup claim: a copy arriving in a LATER micro-batch
    must match the signature stored by the first batch; bucket_cap=1
    still lets later docs probe (they are just not added)."""
    import datetime as dt

    from orientdb_spark.streaming import near_dup_pairs_stream

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different words about spark windows and shuffle planning"
    schema = "doc_id long, text string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    src_dir = tempfile.mkdtemp(prefix="ospark_nd2_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_nd2_ckpt_")
    try:
        b1 = spark.createDataFrame([(1, base, t0), (2, other, t0)], schema)
        b2 = spark.createDataFrame(
            [(3, base, t0 + dt.timedelta(minutes=5)),
             (4, base, t0 + dt.timedelta(minutes=6))],
            schema,
        )
        b1.coalesce(1).write.parquet(src_dir + "/f0")
        b2.coalesce(1).write.parquet(src_dir + "/f1")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/f*")
        )
        out = near_dup_pairs_stream(stream, threshold=0.9, bucket_cap=1)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("nd2_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["doc_id"], r["dup_of"])
            for r in spark.sql("select * from nd2_rows").collect()
        }
        # doc 3 matches the state from batch 1; doc 4 matches doc 1 too
        # (cap=1 keeps only doc 1 per bucket) but NOT doc 3 (never added)
        assert got == {(3, 1), (4, 1)}
        assert len(q.recentProgress) >= 2
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_near_dup_stream_validation(spark):
    import pytest

    from orientdb_spark.streaming import near_dup_pairs_stream

    df = spark.createDataFrame(
        [(1, "a b c", None)], "doc_id long, text string, ts timestamp"
    )
    with pytest.raises(ValueError, match="bands"):
        near_dup_pairs_stream(df, num_hashes=16, bands=5)
    with pytest.raises(ValueError, match="threshold"):
        near_dup_pairs_stream(df, threshold=0.0)
    with pytest.raises(ValueError, match="bucket_cap"):
        near_dup_pairs_stream(df, bucket_cap=0)
    with pytest.raises(ValueError, match="num_hashes"):
        near_dup_pairs_stream(df, num_hashes=0)


def test_heavy_hitters_eviction_hand_checked(spark):
    """Space-saving at capacity 2: the third distinct item evicts the
    (count, item)-minimum counter and inherits its count as max_err;
    within-capacity groups are exact with err 0."""
    import datetime as dt

    from orientdb_spark.streaming import heavy_hitters_stream

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # group 'g': a a a b c  -> capacity 2: c evicts b (count 1),
        # c gets est 2 / err 1; a stays exact at 3
        (1, t0, "g", "a"), (2, t0, "g", "a"), (3, t0, "g", "a"),
        (4, t0, "g", "b"), (5, t0, "g", "c"),
        # group 'h': two distinct -> exact
        (6, t0, "h", "x"), (7, t0, "h", "x"), (8, t0, "h", "y"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, item string"
    )
    got = {
        (r["event_type"], r["item"]): r.asDict()
        for r in heavy_hitters_stream(
            ev, group_cols=("event_type",), item_col="item",
            capacity=2, top_k=10,
        ).collect()
    }
    assert got[("g", "a")]["est_count"] == 3 and got[("g", "a")]["max_err"] == 0
    assert got[("g", "c")]["est_count"] == 2 and got[("g", "c")]["max_err"] == 1
    assert ("g", "b") not in got  # evicted
    assert got[("g", "a")]["rank"] == 1 and got[("g", "c")]["rank"] == 2
    assert got[("h", "x")]["est_count"] == 2 and got[("h", "y")]["max_err"] == 0
    import pytest

    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_stream(ev, item_col="item", capacity=0)


def test_heavy_hitters_stream_matches_batch(spark):
    """The stateful streaming operator must agree with the batch
    applyInPandas formulation when everything arrives as one
    availableNow batch (exactness regime)."""
    from orientdb_spark.streaming import heavy_hitters_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = fix_event_nanos(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    batch = heavy_hitters_stream(events, capacity=100000, top_k=5)
    brows = {
        (r["event_type"], r["item"], r["est_count"], r["max_err"], r["rank"])
        for r in batch.collect()
    }
    assert len(brows) > 0
    src_dir = tempfile.mkdtemp(prefix="ospark_hh_src_")
    ckpt = tempfile.mkdtemp(prefix="ospark_hh_ckpt_")
    try:
        events.coalesce(1).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(events.schema).parquet(src_dir)
        out = heavy_hitters_stream(stream, capacity=100000, top_k=5)
        assert out.isStreaming
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("hh_rows")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        srows = {
            (r["event_type"], r["item"], r["est_count"], r["max_err"], r["rank"])
            for r in spark.sql("select * from hh_rows").collect()
        }
        assert srows == brows
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
