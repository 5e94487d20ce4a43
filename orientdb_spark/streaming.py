"""Streaming surface.

The reference's only push-based operator is the async query
(OSQLAsynchQuery + OCommandResultListener with abort-by-return-value,
core:sql/query/OSQLAsynchQuery.java:30-63 — exposed as
Engine.async_query). Everything else here is Spark-native Structured
Streaming the reference lacks (SURVEY §2.10: watermarks/windows are
"pure Structured Streaming, not reference parity").

The transformations are written batch/stream agnostic: the same function
works on a static DataFrame (driver correctness oracle) and on a
readStream DataFrame (production path) — the standard Structured
Streaming discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_event_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source stream over an events directory (exactly-once file
    discovery; parquet schema required for streams)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.
    Works on static and streaming inputs; pass ``watermark`` (e.g.
    '2 hours') on streams to bound state and admit late data."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Gap-based sessionization (batch formulation): a new session starts
    when the user's inter-event gap exceeds ``gap_minutes``. Returns
    per-session (user_id, session_id, session_start, n_events,
    total_value). On streams the same semantics come from
    ``F.session_window``; the batch version is lag+cumsum — one shuffle
    on user_id."""
    from pyspark.sql import Window

    order = [ts_col] + ([tiebreak_col] if tiebreak_col and tiebreak_col in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    df = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    df = df.withColumn("session_id", F.sum("__new_session").over(w))
    return (
        df.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap sessionization with Spark's native session window — the
    streaming formulation of ``sessionize`` (state is per-user session
    windows, merged on overlap, evicted past the watermark). Works on
    static frames too, where it must agree with the batch lag+cumsum
    version on session count/membership."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_to_batches(stream_df: DataFrame, batch_fn, **options):
    """foreachBatch sink — the push-based listener surface for streams
    (the reference's per-record listener, batched)."""
    return (
        stream_df.writeStream.outputMode(options.pop("outputMode", "update"))
        .foreachBatch(batch_fn)
        .options(**options)
        .start()
    )
