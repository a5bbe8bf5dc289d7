"""Source-side layout helpers.

``ensure_min_parallelism`` fixes the small-file problem: a parquet file with
a single row group cannot be split below one task, so a CPU-heavy stage
(regex extraction, hashing) downstream of a tiny file runs on one core no
matter how many the session has. At 100 TB the scan arrives pre-split into
thousands of input partitions and this helper is a no-op; on a small input
it inserts one round-robin exchange so the expensive work parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism if (and
    only if) its current partitioning is below half of it.

    The guard keeps this a no-op for well-partitioned inputs — we never add
    an exchange to a plan that is already wide enough, so at cluster scale
    the scan's natural split carries through untouched.
    """
    spark = df.sparkSession
    want = target or spark.sparkContext.defaultParallelism
    have = df.rdd.getNumPartitions()
    if have * 2 <= want:
        return df.repartition(want)
    return df
