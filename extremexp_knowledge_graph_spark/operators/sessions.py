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


def sessionize_two_phase(
    events: DataFrame,
    gap: str = "30 minutes",
    bucket: str = "6 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Hot-key-safe sessionization: identical output to ``sessionize`` (a
    pinned test asserts equality), different shuffle shape.

    ``sessionize`` must colocate ALL of a user's events in one task — a bot
    account owning 60% of a day's events is an irreducible straggler there,
    because exact gap semantics need every consecutive-event pair. The
    standard fix is two-phase:

    1. sessionize within (user, tumbling time bucket) — the native
       ``session_window`` runs in parallel across a hot user's buckets, so
       per-task input is bounded by events-per-(user, bucket), not
       events-per-user;
    2. interval-merge the per-bucket sessions per user (lag → strictly-
       greater-than-running-end break → running sum → group, the same
       relational shape as the driver oracle). Sessions touching across a
       bucket boundary merge because ``next.session_start <=
       prev.session_end`` is exactly "inter-event gap <= gap" when end =
       last_event + gap.

    Phase 2 still shuffles on the user key, but it carries SESSION rows
    (orders of magnitude fewer than events for any hot key worth worrying
    about) — the 100 TB shape. ``bucket`` must be >= ``gap`` for merge
    transitivity to stay local to adjacent intervals (asserted). Value
    sums stay exact decimal until the single final round, so the two-phase
    result is bit-identical to the one-phase one.
    """
    import re

    from pyspark.sql.window import Window

    # parse to assert bucket >= gap — accepts every multi-part interval
    # string Spark's session_window does ("1 hour 30 minutes", "90 min"),
    # and raises ValueError (never KeyError) on anything unrecognized
    _UNIT_SECS = {
        "microsecond": 1e-6, "millisecond": 1e-3, "second": 1, "sec": 1,
        "minute": 60, "min": 60, "hour": 3600, "day": 86400, "week": 604800,
    }

    def _secs(s: str) -> float:
        # fullmatch first: trailing unitless tokens ("2 hours 30") or other
        # junk must be rejected up front, not silently ignored — this guard
        # exists to fail EARLY with a clear message
        if not re.fullmatch(r"(\s*-?[0-9.]+\s*[a-zA-Z]+)+\s*", s):
            raise ValueError(f"unparseable interval {s!r}")
        total = 0.0
        for n, unit in re.findall(r"(-?[0-9.]+)\s*([a-zA-Z]+)", s):
            u = unit.lower()
            u = u[:-1] if u.endswith("s") and len(u) > 3 else u  # plural → singular
            if u not in _UNIT_SECS:
                raise ValueError(f"unknown interval unit {unit!r} in {s!r}")
            total += float(n) * _UNIT_SECS[u]
        return total

    gap_s, bucket_s = _secs(gap), _secs(bucket)
    if gap_s <= 0 or bucket_s <= 0:
        raise ValueError("gap and bucket must be positive intervals")
    if bucket_s < gap_s:
        raise ValueError("bucket width must be >= gap")

    aggs = [F.count("*").cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_sv"))
    part = (
        events.withColumn("_tb", F.window(F.col(ts_col), bucket)["start"])
        .groupBy(F.col(user_col), F.col("_tb"), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *([] if value_col is None else ["_sv"]),
        )
    )
    w = Window.partitionBy(user_col).orderBy("session_start", "session_end")
    prior_end = F.max("session_end").over(
        Window.partitionBy(user_col)
        .orderBy("session_start", "session_end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prior_end.isNull() | (F.col("session_start") > prior_end), F.lit(1)
    ).otherwise(F.lit(0))
    merged = part.withColumn("_sid", F.sum(brk).over(w))
    out_aggs = [
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
        F.sum("n_events").cast("long").alias("n_events"),
    ]
    if value_col is not None:
        out_aggs.append(F.round(F.sum("_sv").cast("double"), 6).alias("sum_value"))
    return merged.groupBy(F.col(user_col), F.col("_sid")).agg(*out_aggs).drop("_sid")
