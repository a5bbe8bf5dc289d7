"""Checkpoint manifest — per-stage, per-partition lineage + metrics (H5/E5).

Replaces the reference's volatile ``processed_files`` set (lost on restart,
extremexp_kg_matic/src/file_watcher.py:20,124) and its in-memory metrics
collector (src/monitoring.py:91-148) with a durable manifest table:

    manifest(stage, partition_key, input_fingerprint, rows_in, rows_out,
             wall_ms, status, ts, seq)

Resume = anti-join pending inputs against completed manifest rows, so a
restarted run recomputes nothing that finished — the north rule's
"resumable from checkpoint with per-partition lineage + metrics".
"""

from __future__ import annotations

import datetime as dt
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.schema import MANIFEST_SCHEMA


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Always reads with the EXPLICIT current schema: per-file projection
    fills columns a legacy file lacks with NULL (Iceberg-style evolution),
    and — critically — a mixed old/new-file manifest can never lose a new
    column (e.g. ``seq``) to whichever file's footer Spark happened to pick
    for inference. A schemaless read followed by compaction would rewrite
    the manifest WITHOUT the missing column, permanently."""
    from extremexp_knowledge_graph_spark.plans.kg_store import _recover_interrupted_compact

    _recover_interrupted_compact(path)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def compact_manifest(spark: SparkSession, path: str) -> tuple[int, int]:
    """Rewrite the manifest as one right-sized file.

    Every ``append_manifest`` adds a tiny parquet file; a long-lived
    incremental deployment accumulates thousands (same failure mode as
    store small-files, ``kg_store.compact``). The manifest is driver-scale
    metadata (one row per stage×partition), so a single coalesced file is
    always right-sized. Same two-rename swap + recovery discipline as the
    store compactor. Returns (files_before, files_after).
    """
    import glob
    import os

    from extremexp_knowledge_graph_spark.plans.kg_store import (
        _recover_interrupted_compact,
        swap_rewrite,
    )

    _recover_interrupted_compact(path)
    files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    if not files_before:
        return 0, 0
    # read DIRECTLY (no read_manifest): its empty-DF fallback is right for
    # read-only callers but must never feed a rewrite — a transient read
    # failure would otherwise replace the manifest with an empty table
    df = spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    swap_rewrite(path, lambda tmp: df.coalesce(1).write.mode("overwrite").parquet(tmp))
    return files_before, len(glob.glob(os.path.join(path, "*.parquet")))


def prune_manifest(spark: SparkSession, path: str) -> tuple[int, int]:
    """Retention compaction: keep only the LATEST row (by ts, seq) per
    (stage, partition_key, status), rewritten as one file.

    The manifest is append-only, so a long-lived minute-trigger deployment
    grows it by stages × buckets rows per trigger even when nothing is
    pending. Every consumer windows to the latest row: ``pending_keys`` /
    ``stale_keys`` / ``latest_outputs`` use the latest *done* row per key,
    ``run_stage`` asks "any done row", and ``reconcile_pending`` asks for
    the latest row across statuses — keeping the newest row of EACH status
    preserves all four exactly (a superseded 'started' never shadows a
    'done', and a crash's dangling 'started' survives pruning). Row count
    after = |distinct (stage, key, status)|, bounded regardless of trigger
    count. Same two-rename swap discipline as ``kg_store.compact``.
    Returns (rows_before, rows_after).
    """
    import glob
    import os

    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    from extremexp_knowledge_graph_spark.plans.kg_store import (
        _recover_interrupted_compact,
        swap_rewrite,
    )

    _recover_interrupted_compact(path)
    if not glob.glob(os.path.join(path, "*.parquet")):
        return 0, 0
    # both row metrics ride the single write job as Observations — no
    # separate count scans (same convention as reconcile's store rewrite).
    # Direct read, NOT read_manifest: its empty-DF fallback must never feed
    # a rewrite (a transient read failure would erase the manifest).
    obs_in, obs_out = Observation("prune_in"), Observation("prune_out")
    df = (
        spark.read.schema(MANIFEST_SCHEMA)
        .parquet(path)
        .observe(obs_in, F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("stage", "partition_key", "status").orderBy(
        F.desc("ts"), F.desc_nulls_last("seq")
    )
    kept = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
    )
    swap_rewrite(path, lambda tmp: kept.coalesce(1).write.mode("overwrite").parquet(tmp))
    return int(obs_in.get["n"]), int(obs_out.get["n"])


_seq_lock = threading.Lock()
_last_seq = 0


def _next_seq() -> int:
    """Process-monotonic append sequence: strictly increasing even when two
    appends share a wall-clock microsecond, and never retrograde under clock
    adjustment (wall-clock ns is only a floor). Latest-row selection orders
    by (ts, seq) so it is total-ordered independent of clock resolution."""
    global _last_seq
    with _seq_lock:
        _last_seq = max(_last_seq + 1, time.time_ns())
        return _last_seq


def append_manifest(spark: SparkSession, path: str, rows: list[dict]) -> None:
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    full = [
        {
            "stage": r["stage"],
            "partition_key": r["partition_key"],
            "input_fingerprint": r.get("input_fingerprint"),
            "output_fingerprint": r.get("output_fingerprint"),
            "rows_in": r.get("rows_in"),
            "rows_out": r.get("rows_out"),
            "wall_ms": r.get("wall_ms"),
            "status": r.get("status", "done"),
            "ts": r.get("ts", now),
            "seq": _next_seq(),
        }
        for r in rows
    ]
    spark.createDataFrame(full, MANIFEST_SCHEMA).write.mode("append").parquet(path)


def pending_keys(spark: SparkSession, manifest_path: str, stage: str, keys: DataFrame) -> DataFrame:
    """Anti-join input partition keys against completed manifest rows.

    ``keys``: column ``partition_key``, plus optionally a column ``fp`` — the
    partition's CURRENT input fingerprint. Without ``fp``, a key is pending
    iff it has no done row (pure resume). With ``fp``, a key is also pending
    when its LATEST done row recorded a DIFFERENT fingerprint — i.e. the
    partition's input changed since it last completed, so incremental ingest
    re-opens exactly the changed partitions (downstream overwrite/set-merge
    semantics make re-running safe). Only the latest row counts: an input
    that changes and then reverts (A → B → A) still re-opens, because the
    on-disk output reflects B. A latest row with a NULL recorded fingerprint
    is treated as matching any input (legacy rows stay done).
    """
    from pyspark.sql.window import Window

    done = (
        read_manifest(spark, manifest_path)
        .where((F.col("stage") == stage) & (F.col("status") == "done"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("partition_key").orderBy(
                    F.desc("ts"), F.desc_nulls_last("seq")
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select("partition_key", "input_fingerprint")
    )
    if "fp" not in keys.columns:
        return keys.join(done.select("partition_key").distinct(), "partition_key", "left_anti")
    k, d = keys.alias("k"), done.alias("d")
    cond = (F.col("k.partition_key") == F.col("d.partition_key")) & (
        F.col("d.input_fingerprint").isNull()
        | (F.col("d.input_fingerprint") == F.col("k.fp"))
    )
    return k.join(d, cond, "left_anti")


def stale_keys(
    spark: SparkSession, manifest_path: str, stage: str, upstream_stage: str
) -> list[tuple[str, str | None]]:
    """METADATA-ONLY pending computation for a stage whose input is another
    stage's output: partitions where ``upstream_stage``'s latest recorded
    ``output_fingerprint`` has not been processed by ``stage``.

    This is what makes a no-op resume (and every streaming trigger) cost
    zero data scans for the downstream stages: the upstream stage computes
    each partition's output fingerprint once AT WRITE TIME (in the same
    read-back pass as its lineage counts), and downstream pending checks
    compare manifest rows against manifest rows — never re-scanning the
    data the fingerprints describe.

    Returns ``[(partition_key, upstream_output_fp)]`` (driver-scale: one
    entry per pending partition). Legacy compatibility mirrors
    ``pending_keys``: an upstream row with NULL output fingerprint makes the
    partition pending only if ``stage`` has never completed it; a done row
    of ``stage`` with NULL input fingerprint matches any upstream output.
    """
    from pyspark.sql.window import Window

    man = read_manifest(spark, manifest_path).where(F.col("status") == "done")
    w = Window.partitionBy("partition_key").orderBy(F.desc("ts"), F.desc_nulls_last("seq"))
    latest_up = (
        man.where(F.col("stage") == upstream_stage)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("partition_key", F.col("output_fingerprint").alias("up_fp"))
    )
    # compare against the stage's LATEST done row per key, not any done row:
    # if a partition's input went A → B → back to A, the data on disk
    # reflects B and the stage must re-run even though an old row matches A
    done = (
        man.where(F.col("stage") == stage)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("partition_key", "input_fingerprint")
        .alias("d")
    )
    u = latest_up.alias("u")
    covered = (F.col("u.partition_key") == F.col("d.partition_key")) & (
        F.col("d.input_fingerprint").isNull()
        | F.col("u.up_fp").isNull()
        | (F.col("d.input_fingerprint") == F.col("u.up_fp"))
    )
    pend = u.join(done, covered, "left_anti").collect()
    return [(r.partition_key, r.up_fp) for r in pend]


def latest_outputs(spark: SparkSession, manifest_path: str, stage: str) -> dict[str, str | None]:
    """Latest recorded ``output_fingerprint`` per partition of ``stage``
    (driver-scale dict) — the upstream side of ``stale_keys`` exposed for
    callers that need to seed downstream bookkeeping (e.g. marking every
    existing partition absorbed after a global stage run)."""
    from pyspark.sql.window import Window

    man = read_manifest(spark, manifest_path).where(
        (F.col("status") == "done") & (F.col("stage") == stage)
    )
    w = Window.partitionBy("partition_key").orderBy(F.desc("ts"), F.desc_nulls_last("seq"))
    rows = (
        man.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("partition_key", "output_fingerprint")
        .collect()
    )
    return {r.partition_key: r.output_fingerprint for r in rows}


def run_stage(
    spark: SparkSession,
    manifest_path: str,
    stage: str,
    partition_key: str,
    fn,
    input_fingerprint: str | None = None,
) -> tuple[int, int] | None:
    """Run one resumable unit of work.

    ``fn() -> (rows_in, rows_out)`` does the actual read-transform-write.
    Skips (returns None) if this (stage, partition_key) already completed;
    otherwise records a manifest row with wall time and row metrics.
    """
    already = (
        read_manifest(spark, manifest_path)
        .where(
            (F.col("stage") == stage)
            & (F.col("partition_key") == partition_key)
            & (F.col("status") == "done")
        )
        .limit(1)
        .count()
    )
    if already:
        return None
    t0 = time.monotonic()
    rows_in, rows_out = fn()
    wall_ms = int((time.monotonic() - t0) * 1000)
    append_manifest(
        spark,
        manifest_path,
        [
            {
                "stage": stage,
                "partition_key": partition_key,
                "input_fingerprint": input_fingerprint,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_ms": wall_ms,
                "status": "done",
            }
        ],
    )
    return rows_in, rows_out
