"""Event-stream operators: watermarked windowed aggregation,
gap-sessionization (batch + streaming variants), JSON prop extraction.

The batch variants are the semantics of record (SQL-oracle-checkable);
the streaming variants run the same logic through ``readStream`` with
``Trigger.AvailableNow`` over the same parquet — tested to produce the
identical result, which is exactly the batch/streaming unification
Structured Streaming promises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_MIN = 30


def windowed_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window counts/sums per event_type (epoch-aligned, so
    DuckDB ``time_bucket`` mirrors it exactly)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def windowed_counts_streaming(
    spark: SparkSession,
    parquet_path: str,
    minutes: int = 5,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Same aggregation as a streaming query with a watermark; run with
    ``Trigger.AvailableNow`` to drain the source and stop.

    ``max_files_per_trigger=1`` splits the drain into one micro-batch
    per source file (AvailableNow honors the option) — the shape that
    actually EXERCISES the watermark: it only advances between batches,
    so single-batch drains can never drop a late row or finalize a
    window.  Pair with ``run_stream_append_to_memory`` for the
    append-mode late-data semantics."""
    schema, parquet_path = _stage_stream_dir(spark, parquet_path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(parquet_path)
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # group by the FULL window struct (extracting .start inside the
    # groupBy strips the event-time tag append mode needs to know the
    # aggregation is watermark-bounded), project start afterward
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window").getField("start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def run_stream_to_memory(spark: SparkSession, sdf: DataFrame, name: str) -> DataFrame:
    """Drain an availableNow stream into an in-memory table; returns the
    batch result DataFrame."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_stream_append_to_memory(spark: SparkSession, sdf: DataFrame, name: str) -> DataFrame:
    """Drain an availableNow stream in APPEND output mode: a window row
    is emitted exactly once, when the watermark passes its end — rows
    later than the watermark are DROPPED from their (already finalized)
    window, and windows the watermark never reaches stay unemitted in
    state.  This is the at-scale output mode: state stays bounded by
    the watermark horizon and sinks receive immutable appends, where
    complete mode re-emits the whole result table every trigger."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization per user (batch semantics of record):
    a new session starts when the gap to the previous event exceeds
    ``gap_minutes``.  (user_id, n_sessions, n_events)."""
    # parquet timestamps may arrive as TIMESTAMP_NTZ; pin to session-UTC
    # TIMESTAMP so microsecond arithmetic matches the SQL oracle exactly
    events = events.withColumn("_tsx", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("_tsx")
    flagged = events.withColumn(
        "new_session",
        (
            F.coalesce(
                (F.unix_micros("_tsx") - F.unix_micros(F.lag("_tsx").over(w)))
                > gap_minutes * 60 * 1_000_000,
                F.lit(True),
            )
        ).cast("int"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
    )


_STAGE_MEMO: dict = {}


def _stage_stream_dir(spark: SparkSession, parquet_path: str):
    """File-stream sources need a DIRECTORY; stage single files into a
    temp dir once per (source path) — memoized so repeated streaming
    queries over the same parquet don't re-copy."""
    import os
    import shutil
    import tempfile

    if parquet_path in _STAGE_MEMO:
        return _STAGE_MEMO[parquet_path]
    schema = spark.read.parquet(parquet_path).schema
    staged = parquet_path
    if os.path.isfile(parquet_path):
        staged = tempfile.mkdtemp(prefix="stream_src_")
        shutil.copy(parquet_path, staged)
    _STAGE_MEMO[parquet_path] = (schema, staged)
    return schema, staged


def sessionize_stateful_streaming(
    spark: SparkSession, parquet_path: str, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """Gap sessionization as a CUSTOM STATEFUL streaming operator via
    ``applyInPandasWithState`` (the north_star's named shape): per-user
    GroupState carries (last_ts_us, n_sessions, n_events) across
    micro-batches; each batch is processed vectorized (NumPy diff
    against the carried timestamp — no per-row Python).  Output mode
    'update' emits the running totals; with ``Trigger.AvailableNow``
    the final update per user equals the batch ``sessionize`` result
    (asserted by test).

    Ordering: all Arrow chunks of a micro-batch are concatenated and
    sorted ONCE before the gap diff, so out-of-order delivery *within*
    a micro-batch (multiple chunks / files) cannot produce a negative
    diff.  Late arrivals that land in a *later* micro-batch than a
    newer timestamp are still counted against the carried ``last_ts``
    (streaming state cannot retro-sort history); such cross-micro-batch
    late data may undercount sessions vs the batch semantics of record.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    schema, parquet_path = _stage_stream_dir(spark, parquet_path)
    stream = spark.readStream.schema(schema).parquet(parquet_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        (uid,) = key
        last_ts, n_sessions, n_events = state.get if state.exists else (-1, 0, 0)
        chunks = [pdf["ts"].astype("int64").to_numpy() for pdf in pdfs if len(pdf)]
        if chunks:
            t_us = np.sort(np.concatenate(chunks)) // 1000
            first_prev = last_ts if last_ts >= 0 else t_us[0] - gap_us - 1
            prev = np.concatenate(([first_prev], t_us[:-1]))
            n_sessions += int((t_us - prev > gap_us).sum())
            n_events += len(t_us)
            last_ts = int(t_us[-1])
        state.update((int(last_ts), int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {"user_id": [uid], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts long, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_updates_to_memory(spark: SparkSession, sdf: DataFrame, name: str) -> DataFrame:
    """Drain an update-mode availableNow stream into a memory table;
    returns the LAST update per key grain (callers dedupe if multiple
    micro-batches fired)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def json_prop_sums(events: DataFrame) -> DataFrame:
    """Extract the JSON prop 'k' and aggregate per event_type."""
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )
