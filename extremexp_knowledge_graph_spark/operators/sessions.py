"""Event-time sessionization — gap-based session windows over an event
stream, the classic "hard in plain SQL, native in Spark" analytics shape.

Uses Spark's built-in ``session_window`` (JVM-side, merge-on-overlap
state, works identically in batch and Structured Streaming — the
streaming form just adds a watermark). Session semantics: each event opens
a window ``[ts, ts + gap]`` and TOUCHING windows merge — an event landing
exactly at the previous window's end continues the session, so a new
session starts only when the inter-event gap strictly exceeds ``gap``
(measured against Spark 4.1 in ``test_sessionize_gap_semantics``). The
window end Spark reports is ``last_event_ts + gap``.

At scale this is one shuffle on the session key (user), then a linear
merge per key — the same cost envelope as a groupBy, and the natural
100 TB plan. The driver oracle replays the semantics relationally
(lag → gap-break flag → running sum → group), which doubles as
documentation that the two formulations are equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Group events into per-user sessions separated by ``gap`` of
    inactivity. Output: (user, session_start, session_end, n_events
    [, sum_value]) with session_end = last event + gap (Spark's native
    window end). ``value_col`` sums exactly in decimal then rounds — the
    repo's deterministic-float convention."""
    aggs = [F.count("*").cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"), 6
            ).alias("sum_value")
        )
    return (
        events.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *(
                ["n_events"]
                if value_col is None
                else ["n_events", "sum_value"]
            ),
        )
    )
