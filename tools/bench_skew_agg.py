"""Hot-key skew evidence for the aggregation shuffles (round-4 verdict
item #8): ``degree_topk`` (hot subject) and ``sessionize`` (hot user).

Two different stories, both measured on identical skewed vs uniform input:

* degree_topk is a plain hash aggregate — map-side partial aggregation
  collapses a hot node to ONE row per map task before the exchange, so a
  60%-hot subject produces no straggler at all. Evidence: the post-shuffle
  per-task row maxima and wall time are flat between skewed and uniform.
* sessionize must colocate each user's EVENTS (exact gap semantics), so a
  hot user IS a straggler in the one-phase plan. Evidence: max
  events-per-key vs events-per-(key, bucket), and the wall-time win of
  ``sessionize_two_phase`` (intra-bucket session_window, then per-user
  interval-merge over SESSION rows) on the same skewed input — with the
  pinned-equal output (test_sessionize_two_phase_equals_one_phase).

Prints one JSON line, appends a BENCH.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    rows = int(os.environ.get("SKEW_ROWS", "2000000"))
    hot_frac = float(os.environ.get("SKEW_HOT_FRAC", "0.6"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from pyspark.sql import functions as F

    from extremexp_knowledge_graph_spark.operators.sessions import (
        sessionize,
        sessionize_two_phase,
    )
    from extremexp_knowledge_graph_spark.plans.queries import degree_topk
    from extremexp_knowledge_graph_spark.session import get_spark

    spark = get_spark("skew-agg-bench", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    hot_n = int(rows * hot_frac)

    def timed(fn, reps=2):
        best = None
        for i in range(reps + 1):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            if i == 0:
                continue  # warm-up run excluded from the best-of
            if best is None or dt < best:
                best = dt
        return round(best, 3)

    # ---- degree_topk: hot subject vs uniform -------------------------------
    def triples(hot: bool):
        subj = (
            F.when(F.col("id") < hot_n, F.lit("http://example.org/HOT"))
            if hot
            else F.when(F.lit(False), F.lit(""))
        ).otherwise(F.concat(F.lit("http://example.org/e"), F.col("id") % 200000))
        t = spark.range(rows).select(
            subj.alias("subj"),
            F.lit("http://example.org/p").alias("pred"),
            F.concat(F.lit("http://example.org/o"), F.col("id") % 100000).alias("obj"),
            F.lit(True).alias("obj_is_iri"),
        )
        return t.repartition(2 * cpus).localCheckpoint()

    t_hot, t_uni = triples(True), triples(False)
    deg_hot = timed(lambda: degree_topk(t_hot, k=20).collect(), reps=3)
    deg_uni = timed(lambda: degree_topk(t_uni, k=20).collect(), reps=3)

    def degree_agg(t):
        # the full post-shuffle aggregate (before top-k): per-reduce-task row
        # counts measure the straggler directly
        nodes = t.select(F.col("subj").alias("node")).unionByName(
            t.where("obj_is_iri").select(F.col("obj").alias("node"))
        )
        return nodes.groupBy("node").count()

    max_task_hot = max(degree_agg(t_hot).rdd.glom().map(len).collect())
    max_task_uni = max(degree_agg(t_uni).rdd.glom().map(len).collect())

    # ---- sessionize: hot user, one-phase vs two-phase ----------------------
    def events():
        # 48h of events; hot user 0 owns hot_frac, the rest spread over 50k
        # users; ts deterministic per id (hash-scattered seconds)
        return (
            spark.range(rows)
            .select(
                F.when(F.col("id") < hot_n, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id"), F.lit(50000)) + 1)
                .cast("long")
                .alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1700000000) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(48 * 3600))
                ).alias("ts"),
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 100.0).alias("value"),
            )
            .repartition(2 * cpus)
            .localCheckpoint()
        )

    ev = events()
    one = timed(lambda: sessionize(ev, gap="30 minutes", value_col="value").count())
    two = timed(
        lambda: sessionize_two_phase(
            ev, gap="30 minutes", bucket="3 hours", value_col="value"
        ).count()
    )
    key_max = ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    bucket_max = (
        ev.withColumn("_tb", F.window("ts", "3 hours")["start"])
        .groupBy("user_id", "_tb")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

    result = {
        "rows": rows,
        "hot_frac": hot_frac,
        "degree_topk": {
            "hot_sec": deg_hot,
            "uniform_sec": deg_uni,
            "hot_over_uniform": round(deg_hot / deg_uni, 2),
            "max_reduce_task_rows_hot": int(max_task_hot),
            "max_reduce_task_rows_uniform": int(max_task_uni),
        },
        "sessionize": {
            "one_phase_sec": one,
            "two_phase_sec": two,
            "speedup": round(one / two, 2),
            "max_events_per_user": int(key_max),
            "max_events_per_user_bucket": int(bucket_max),
            "straggler_input_reduction": round(key_max / bucket_max, 2),
        },
    }
    print(json.dumps(result))

    md = Path(__file__).resolve().parents[1] / "BENCH.md"
    section = f"""
## Aggregation-shuffle skew: degree hash-agg vs sessionize ({time.strftime("%Y-%m-%d %H:%M:%S")})

{rows:,} rows, one hot key owning {hot_frac:.0%} ({cpus} cores, identical
pre-checkpointed input layout), round-4 verdict item #8:

**degree_topk has no straggler task under skew** — map-side partial
aggregation collapses the hot node to one row per map task before the
exchange, so the reducer carrying the hot key receives max
{int(max_task_hot):,} rows vs {int(max_task_uni):,} uniform (ratio
{max_task_hot / max(max_task_uni, 1):.2f} — the exchange is flat). Wall:
hot {deg_hot:.3f} s vs uniform {deg_uni:.3f} s
({result["degree_topk"]["hot_over_uniform"]}× — any residual is the
map-side combine itself, which parallelizes, not a straggler).

**sessionize's user-key shuffle is NOT** (exact gap semantics need all of
a user's events in one task): the hot user concentrates
{int(key_max):,} events in one task. `sessionize_two_phase` (intra-bucket
`session_window`, then per-user interval-merge over SESSION rows; output
pinned bit-identical by `test_sessionize_two_phase_equals_one_phase`)
bounds per-task input at events-per-(user, 3h-bucket) =
{int(bucket_max):,} — a {result["sessionize"]["straggler_input_reduction"]}×
straggler-input reduction — and runs {result["sessionize"]["speedup"]}×
faster on this input ({one:.3f} s → {two:.3f} s).
"""
    md.write_text((md.read_text() if md.exists() else "# BENCH\n") + section)
    spark.stop()


if __name__ == "__main__":
    main()
