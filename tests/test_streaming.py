"""Structured Streaming tests: file-source ingest, watermarked windowed
aggregation, stream dedup, foreachBatch table sink — all with
availableNow triggers so they run bounded in CI."""

import json
import os
import tempfile
import uuid

import pytest

from swanlake_spark.streaming import (
    stream_events_from_directory,
    streaming_append_to_table,
    streaming_dedup,
    windowed_event_counts,
)


@pytest.fixture()
def event_dir():
    d = tempfile.mkdtemp(prefix="swl_stream_")
    rows = []
    for i in range(100):
        rows.append(
            {
                "event_id": i,
                "ts": f"2025-01-01T00:{i % 60:02d}:{i % 10:02d}.000Z",
                "user_id": i % 5,
                "event_type": ["click", "view"][i % 2],
                "value": float(i),
                "props": "{}",
            }
        )
    # a duplicate event for dedup testing
    rows.append(dict(rows[0]))
    with open(os.path.join(d, "batch1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return d


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if not df.isStreaming or True else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_windowed_counts(spark, event_dir):
    events = stream_events_from_directory(spark, event_dir)
    agg = windowed_event_counts(events, "1 minute", watermark="2 minutes")
    name = f"m_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT * FROM {name}").collect()
    # Append mode emits only windows closed by the final watermark
    # (max ts 00:59:09 − 2 min ⇒ windows ending after 00:57:09 are
    # withheld): events at minutes 57–59 (i=57,58,59) stay in state.
    assert sum(r.cnt for r in out) == 98
    assert {r.event_type for r in out} == {"click", "view"}
    # window [00:00,00:01) holds i=0, i=60 and the duplicate of i=0 — all clicks
    w0 = [r for r in out if r.window_start.minute == 0 and r.window_start.hour == 0]
    assert {(r.event_type, r.cnt) for r in w0} == {("click", 3)}


def test_stream_dedup(spark, event_dir):
    events = stream_events_from_directory(spark, event_dir)
    deduped = streaming_dedup(events, keys=["event_id"], watermark="10 minutes")
    name = f"m_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT count(*) AS c, count(DISTINCT event_id) AS d FROM {name}").collect()[0]
    assert out.c == 100  # duplicate dropped
    assert out.d == 100


def test_stream_append_to_table(spark, engine, event_dir):
    name = f"ev_{uuid.uuid4().hex[:8]}"
    loc = tempfile.mkdtemp(prefix="swl_test_")
    engine.execute(
        f"CREATE TABLE {name} (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        f"event_type STRING, value DOUBLE, props STRING) "
        f"USING parquet LOCATION '{loc}'"
    )
    events = stream_events_from_directory(spark, event_dir)
    ckpt = tempfile.mkdtemp(prefix="swl_ckpt_")
    q = streaming_append_to_table(events, name, ckpt)
    q.awaitTermination(120)
    assert engine.query(f"SELECT count(*) AS c FROM {name}").collect()[0].c == 101
