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

    writer = events.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
