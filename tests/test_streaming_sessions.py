"""Streaming sessionization (streaming/sessions.py) — proves the claim in
operators/sessions.py that the native ``session_window`` plan runs
identically under Structured Streaming with a watermark.

Contract mirrors tests/test_streaming_windowed.py: every session the
stream emits carries exactly the batch-computed values (batch plan as
oracle), sessions are emitted once (append mode), and a restart with more
data flushes the held-back tail without re-emitting closed sessions.
"""

from __future__ import annotations

import datetime as dt

from extremexp_knowledge_graph_spark.operators.sessions import sessionize
from extremexp_knowledge_graph_spark.streaming.sessions import stream_sessions
from extremexp_knowledge_graph_spark.streaming.windowed import EVENTS_SCHEMA

BASE = dt.datetime(2025, 3, 1, 0, 0, 0)

# (user, minutes-offset) clusters: user 1 has two sessions separated by a
# 90-minute gap (> 30m); user 2 straddles the touching-window boundary —
# an event exactly 30m after the previous one CONTINUES the session.
EVENTS_1 = [
    (1, 0.0), (1, 10.0), (1, 20.0),          # user1 session A (3 events)
    (1, 110.0), (1, 115.0),                  # user1 session B (2 events)
    (2, 0.0), (2, 30.0),                     # user2: touching windows merge
]
LATE_1 = [(3, 20 * 60.0)]                    # hour-20 event: watermark → 18h
LATE_2 = [(3, 30 * 60.0)]                    # hour-30 event: flush the tail


def _events(spark, specs, start_id=0):
    rows = [
        (start_id + i, BASE + dt.timedelta(minutes=m), u, "click", float((start_id + i) % 5))
        for i, (u, m) in enumerate(specs)
    ]
    # one part-file per logical batch → deterministic watermark progression
    return spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(1)


def _key(r):
    return (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)


def test_stream_sessions_matches_batch_oracle(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("inp", "out", "ckpt"))
    _events(spark, EVENTS_1).write.mode("append").parquet(inp)
    _events(spark, LATE_1, start_id=100).write.mode("append").parquet(inp)

    q = stream_sessions(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    batch = sessionize(
        spark.read.schema(EVENTS_SCHEMA).parquet(inp), value_col="value"
    )
    batch_keys = {_key(r) for r in batch.collect()}

    got = spark.read.parquet(out).collect()
    keys = [_key(r) for r in got]
    assert len(keys) == len(set(keys)), "session emitted twice"
    # every emitted session is byte-for-byte the batch plan's session
    assert set(keys) <= batch_keys
    # the three early sessions closed (watermark = 20h - 2h = 18h ≫ ends):
    # user1×2 + user2×1 — including the touching-window merge for user 2
    early = {k for k in keys if k[0] in (1, 2)}
    assert len(early) == 3
    u2 = [k for k in keys if k[0] == 2]
    assert len(u2) == 1 and u2[0][3] == 2  # one merged 2-event session

    # restart with later data: flushes the held-back hour-20 session,
    # re-emits nothing
    n_before = len(got)
    _events(spark, LATE_2, start_id=200).write.mode("append").parquet(inp)
    q2 = stream_sessions(spark, inp, out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(180)
    got2 = spark.read.parquet(out).collect()
    keys2 = [_key(r) for r in got2]
    assert len(keys2) == len(set(keys2)), "restart re-emitted a closed session"
    assert len(got2) > n_before
    batch2_keys = {
        _key(r)
        for r in sessionize(
            spark.read.schema(EVENTS_SCHEMA).parquet(inp), value_col="value"
        ).collect()
    }
    assert set(keys2) <= batch2_keys
    assert any(k[0] == 3 for k in keys2)  # the hour-20 session flushed
