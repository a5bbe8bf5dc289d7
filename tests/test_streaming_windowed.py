"""Watermarked windowed streaming aggregation (streaming/windowed.py).

Asserts the streaming contract against the batch plan as oracle: every
window the stream emits carries exactly the batch-computed values, windows
are emitted once (append mode), and late-arriving data past the watermark
advances the stream without corrupting already-emitted windows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.streaming.windowed import (
    EVENTS_SCHEMA,
    stream_events_hourly,
    windowed_event_counts,
)

BASE = dt.datetime(2025, 1, 1, 0, 0, 0)


def _events(spark, hours, start_id=0):
    """3 events per listed hour (2 click, 1 view), deterministic values."""
    rows = []
    for i, h in enumerate(hours):
        for j, et in enumerate(["click", "click", "view"]):
            eid = start_id + 3 * i + j
            rows.append(
                (eid, BASE + dt.timedelta(hours=h, minutes=10 * j), eid % 7, et, float(eid % 5))
            )
    # one part-file per logical batch so maxFilesPerTrigger=1 gives a
    # deterministic batch/watermark progression
    return spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(1)


def test_stream_matches_batch_oracle(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("inp", "out", "ckpt"))

    # file 1: hours 0..5; file 2: a much later event that advances the
    # watermark (2h) past hours 0..3 on the second micro-batch
    _events(spark, [0, 1, 2, 3, 4, 5]).write.mode("append").parquet(inp)
    _events(spark, [20], start_id=100).write.mode("append").parquet(inp)

    q = stream_events_hourly(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    emitted = spark.read.parquet(out)
    batch = windowed_event_counts(
        spark.read.schema(EVENTS_SCHEMA).parquet(inp)
    )
    batch_map = {
        (r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()
    }
    got = emitted.collect()
    assert len(got) > 0
    # append mode: each emitted window appears once, with batch-exact values
    keys = [(r.window_start, r.event_type) for r in got]
    assert len(keys) == len(set(keys)), "window emitted twice"
    for r in got:
        assert batch_map[(r.window_start, r.event_type)] == (r.n, r.sum_value)
    # no window past the final watermark may have been emitted
    assert all(r.window_start < BASE + dt.timedelta(hours=19) for r in got)

    # second run: one more very-late file advances the watermark to flush
    # the hour-4/5 tail; already-emitted windows are not re-emitted
    n_before = len(got)
    _events(spark, [30], start_id=200).write.mode("append").parquet(inp)
    q2 = stream_events_hourly(spark, inp, out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(180)
    emitted2 = spark.read.parquet(out)
    got2 = emitted2.collect()
    assert len(got2) > n_before
    keys2 = [(r.window_start, r.event_type) for r in got2]
    assert len(keys2) == len(set(keys2)), "restart re-emitted a closed window"
    for r in got2:
        assert batch_map.get((r.window_start, r.event_type), "new") != "new" or r.window_start >= BASE + dt.timedelta(hours=20)
    # hours 0..5 fully flushed now (watermark 28h)
    early = [r for r in got2 if r.window_start < BASE + dt.timedelta(hours=6)]
    assert len(early) == 6 * 2  # 6 hours × 2 event types
