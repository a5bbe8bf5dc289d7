"""Streaming front-door for the web-regime DAG (A5/A6 generalized to pages).

The reference watches a directory for paper JSON and pushes each file through
its per-row pipeline (extremexp_kg_matic/src/file_watcher.py:204-329). The
web-scale analogue watches for page dumps (parquet drops of the
``pages(url, warc_ts, html, text, lang)`` relation — e.g. one file per crawl
segment) and drives the SAME S1-S4 incremental pipeline:

  readStream(pages dir)
    → foreachBatch: idempotent url-keyed append into the cumulative pages
      table (re-delivered micro-batches insert nothing — exactly-once
      without sink transactions)
    → run_web_pipeline over the cumulative table: the input-fingerprint
      manifest re-opens ONLY the buckets the new pages hash into; S3's
      delta pass assigns canonicals to newly seen entities; S4's set-merge
      inserts only new triples.

So the streaming layer contributes exactly-once accumulation + triggering,
and ALL transformation semantics stay in one place — the batch DAG. Batch
and streaming ingestion of the same pages produce identical stores
(asserted by tests/test_web_pipeline.py::test_streaming_pages_matches_batch).

``trigger=availableNow`` drains what is present then stops (A6 backfill /
test mode); omit for the continuous watcher (A5).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.plans.web_pipeline import run_web_pipeline
from extremexp_knowledge_graph_spark.schema import PAGES_SCHEMA


def stream_pages_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_url_buckets: int = 16,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Watch ``input_dir`` for pages parquet drops; keep ``out_dir`` (docs/
    linked/entity_map/triples/manifest + the cumulative ``pages`` table)
    up to date incrementally. Returns the StreamingQuery."""
    pages_path = f"{out_dir}/pages"
    raw = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(["url"])
        try:
            existing = spark.read.parquet(pages_path).select("url")
        except Exception:  # first batch: table does not exist yet
            existing = None
        if existing is not None:
            # url-keyed anti-join append: a re-delivered batch (foreachBatch
            # is at-least-once) inserts nothing, so the cumulative table —
            # and therefore every bucket fingerprint — is exactly-once.
            batch = batch.join(existing, "url", "left_anti")
        batch.write.mode("append").parquet(pages_path)
        run_web_pipeline(
            spark,
            spark.read.parquet(pages_path),
            out_dir,
            n_url_buckets=n_url_buckets,
        )

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
