"""A5/A6/A12 — streaming ingestion: watched directory → triple store.

Replaces the reference's watchdog/polling file watcher with its
wait-for-stability heuristic, in-memory dedup set, retry/backoff and
quarantine logic (extremexp_kg_matic/src/file_watcher.py:25-329, ~300 LoC)
with a Structured Streaming file source: atomic file discovery, checkpointed
exactly-once progress (survives restarts — the reference's ``processed_files``
set does not), and corrupt-record quarantine as a column filter instead of a
retry loop.

``trigger=availableNow`` drains everything present then stops — that is the
startup-backfill path (A6, src/file_watcher.py:305-329) and what tests use;
leaving it out gives the continuous watcher (A5).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
from extremexp_knowledge_graph_spark.plans.kg_store import merge_triples
from extremexp_knowledge_graph_spark.schema import PAPER_RAW_SCHEMA
from extremexp_knowledge_graph_spark.sources.papers_json import CORRUPT_COL, normalize_aliases


def stream_papers_to_triples(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    quarantine_path: str | None = None,
    available_now: bool = True,
):
    """Watch ``input_dir`` for paper-JSON files; merge their triples into the
    store idempotently; quarantine unparseable files (A12) with provenance.

    Returns the StreamingQuery (call ``.awaitTermination()``).
    """
    schema = StructType(list(PAPER_RAW_SCHEMA.fields) + [StructField(CORRUPT_COL, StringType())])
    raw = (
        spark.readStream.schema(schema)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 64)
        .json(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        batch_df = batch_df.withColumn("prov", F.input_file_name()).localCheckpoint()
        bad = batch_df.where(F.col(CORRUPT_COL).isNotNull())
        good = batch_df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        if quarantine_path is not None:
            # quarantine row = raw record + source file + reason (A12's
            # error-report file, as a queryable table). Written
            # unconditionally: an empty append is one no-op task, while a
            # `bad.limit(1).count()` emptiness probe costs a scheduler
            # round-trip per micro-batch.
            bad.select(
                F.col(CORRUPT_COL).alias("raw"),
                F.col("prov").alias("source_file"),
                F.lit("json_parse_error").alias("reason"),
                F.current_timestamp().alias("ts"),
            ).write.mode("append").parquet(quarantine_path)
        papers = normalize_aliases(good)
        merge_triples(spark, papers_to_triples(papers), store_path)

    writer = raw.writeStream.foreachBatch(process_batch).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
