"""SparkSession factory with scale-oriented defaults.

Defaults target the sandbox (single JVM, ``local[N]``) but are the same knobs
that matter on a 1000-executor cluster: AQE on (runtime coalescing + skew-join
splitting), Arrow for every pandas UDF boundary, shuffle partition count sized
to the parallelism level, and broadcast join threshold left to Spark (small
dimension tables in the KG pipeline — gazetteers, ontology maps — are
broadcast explicitly at call sites).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: None until the first get_spark call; then whether the JVM was launched
#: with an external master (spark-submit). See the comment in get_spark.
_LAUNCHER_HAS_MASTER: bool | None = None


def get_spark(
    app_name: str = "extremexp-kg-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions
    default to 2× the core count — enough granularity for AQE to coalesce
    down, without thousands of empty tasks at test scale. On a real cluster
    these come from spark-submit; nothing here hard-codes local mode into the
    engine itself.
    """
    cpus_s = str(cpus) if cpus else os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    # Honor a master set by the launcher (spark-submit --master …); only
    # default to local[N] when running as a bare python process. The
    # launcher check must be captured ONCE per process: after any
    # SparkContext starts, spark.master persists in the reused JVM's system
    # properties, so re-checking SparkConf() on a second get_spark call
    # would silently pin every later session to the FIRST session's master
    # (this bug made a local[16] request run at local[4] and torpedoed the
    # scaling benchmark).
    global _LAUNCHER_HAS_MASTER
    if _LAUNCHER_HAS_MASTER is None:
        from pyspark import SparkConf

        _LAUNCHER_HAS_MASTER = SparkConf().contains("spark.master")
    if not _LAUNCHER_HAS_MASTER:
        builder = builder.master(f"local[{cpus_s}]")
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _default_shuffle(cpus_s)))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _default_shuffle(cpus_s: str) -> int:
    if cpus_s == "*":
        count = os.cpu_count() or 8
    else:
        count = int(cpus_s)
    return max(8, 2 * count)
