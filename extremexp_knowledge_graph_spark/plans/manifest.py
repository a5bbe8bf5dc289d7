"""Checkpoint manifest — per-stage, per-partition lineage + metrics (H5/E5).

Replaces the reference's volatile ``processed_files`` set (lost on restart,
extremexp_kg_matic/src/file_watcher.py:20,124) and its in-memory metrics
collector (src/monitoring.py:91-148) with a durable manifest table:

    manifest(stage, partition_key, input_fingerprint, rows_in, rows_out,
             wall_ms, status, ts)

Resume = anti-join pending inputs against completed manifest rows, so a
restarted run recomputes nothing that finished — the north rule's
"resumable from checkpoint with per-partition lineage + metrics".
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.schema import MANIFEST_SCHEMA


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    from extremexp_knowledge_graph_spark.plans.kg_store import _recover_interrupted_compact

    _recover_interrupted_compact(path)
    try:
        return spark.read.parquet(path)
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
    import shutil

    from extremexp_knowledge_graph_spark.plans.kg_store import _recover_interrupted_compact

    _recover_interrupted_compact(path)
    files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    if not files_before:
        return 0, 0
    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".old"
    spark.read.parquet(path).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return files_before, len(glob.glob(os.path.join(path, "*.parquet")))


def append_manifest(spark: SparkSession, path: str, rows: list[dict]) -> None:
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    full = [
        {
            "stage": r["stage"],
            "partition_key": r["partition_key"],
            "input_fingerprint": r.get("input_fingerprint"),
            "rows_in": r.get("rows_in"),
            "rows_out": r.get("rows_out"),
            "wall_ms": r.get("wall_ms"),
            "status": r.get("status", "done"),
            "ts": r.get("ts", now),
        }
        for r in rows
    ]
    spark.createDataFrame(full, MANIFEST_SCHEMA).write.mode("append").parquet(path)


def pending_keys(spark: SparkSession, manifest_path: str, stage: str, keys: DataFrame) -> DataFrame:
    """Anti-join input partition keys against completed manifest rows.

    ``keys``: column ``partition_key``, plus optionally a column ``fp`` — the
    partition's CURRENT input fingerprint. Without ``fp``, a key is pending
    iff it has no done row (pure resume). With ``fp``, a key is also pending
    when every done row recorded a DIFFERENT fingerprint — i.e. the
    partition's input changed since it completed, so incremental ingest
    re-opens exactly the changed partitions (downstream overwrite/set-merge
    semantics make re-running safe). A done row with a NULL recorded
    fingerprint is treated as matching any input (legacy rows stay done).
    """
    done = (
        read_manifest(spark, manifest_path)
        .where((F.col("stage") == stage) & (F.col("status") == "done"))
        .select("partition_key", "input_fingerprint")
        .distinct()
    )
    if "fp" not in keys.columns:
        return keys.join(done.select("partition_key").distinct(), "partition_key", "left_anti")
    k, d = keys.alias("k"), done.alias("d")
    cond = (F.col("k.partition_key") == F.col("d.partition_key")) & (
        F.col("d.input_fingerprint").isNull()
        | (F.col("d.input_fingerprint") == F.col("k.fp"))
    )
    return k.join(d, cond, "left_anti")


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
