"""Streaming ingest and analytics over the events stream.

Shapes covered (all standard Structured Streaming, scale-ready):

- directory-watch ingest (the streaming analogue of the reference's
  appender: new files land, rows append downstream exactly-once);
- watermarked tumbling/sliding window aggregation with late-data
  handling;
- streaming dedup within a watermark (``dropDuplicatesWithinWatermark``);
- append into a warehouse table via ``foreachBatch`` (reusing the batch
  alignment operator, so stream and appender ingest share one code path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events_from_directory(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "json",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream of events. New files in ``source_dir`` are
    discovered per micro-batch; ``maxFilesPerTrigger`` bounds batch size
    so executor memory is independent of backlog length."""
    reader = (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    return reader.load(source_dir)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation: counts + value sums per
    (window, event_type). Late rows beyond the watermark are dropped;
    state is bounded by watermark horizon — the canonical streaming-agg
    memory contract."""
    w = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-key stream dedup within the watermark horizon —
    the streaming form of exact dedup (state expires with the watermark,
    so memory is bounded)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: event-time sessionization per user via
    ``applyInPandasWithState`` — the escape hatch for semantics Spark's
    built-in streaming operators can't express (SURVEY §2.6 extension
    path). A session is a run of events for one user with no gap longer
    than ``gap``; a session row is emitted when event time (the
    watermark) passes ``last_event + gap``.

    State per user is four scalars — memory is O(active users), expired
    by event-time timeout, the bounded-state contract that makes this
    safe on an unbounded stream.
    """
    import pandas as pd  # noqa: F401 (applyInPandasWithState ships pandas)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from swanlake_spark.pyship import ship_package

    ship_package(events.sparkSession)

    gap_ms = _duration_ms(gap)
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    state_schema = "start long, last long, n long, s double"

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return
        start = last = None
        n, s = 0, 0.0
        if state.exists:
            start, last, n, s = state.get
        for pdf in pdf_iter:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            start = min([start, *ts_ms]) if start is not None else min(ts_ms)
            last = max([last, *ts_ms]) if last is not None else max(ts_ms)
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((start, last, n, s))
        # Late rows are NOT auto-dropped for flatMapGroupsWithState (only
        # aggregations drop them), so last+gap can lie behind the
        # watermark — clamp, else Spark rejects the past timestamp.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(text: str) -> int:
    m = {"second": 1000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    parts = text.strip().split()
    qty = int(parts[0])
    unit = parts[1].rstrip("s")
    if unit not in m:
        raise ValueError(f"unsupported duration: {text!r}")
    return qty * m[unit]


def streaming_append_to_table(
    events: DataFrame,
    table: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Sink a stream into a warehouse table via foreachBatch + the batch
    alignment operator — the streaming appender. Exactly-once per
    micro-batch via the checkpoint; append = new immutable parquet
    part-files (compaction handles the small files, maintenance.py)."""
    from swanlake_spark.operators.ingest import align_to_schema

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        aligned = align_to_schema(batch_df, spark.table(table).schema)
        aligned.write.insertInto(table)
        from swanlake_spark import versions

        versions.record_version(spark, table, f"stream_batch_{batch_id}")

    writer = events.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
