"""End-to-end web-regime DAG (plans/web_pipeline.py): S1→S4 over synthetic
pages, manifest-driven resume, idempotent re-run.

Reference parity anchor: the DAG is the Spark-native generalization of the
reference's watch→transform→dedupe→load loop
(extremexp_kg_matic/src/file_watcher.py:204-329); resume semantics replace
its in-memory ``processed_files`` set (src/file_watcher.py:20,124).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.plans import web_pipeline as wp
from extremexp_knowledge_graph_spark.plans.manifest import read_manifest
from extremexp_knowledge_graph_spark.sources.synthetic_pages import generate_pages


def _store_key_set(spark, out_dir):
    t = spark.read.parquet(f"{out_dir}/triples")
    return {(r.subj, r.pred, r.obj) for r in t.select("subj", "pred", "obj").collect()}


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 60).cache()


def test_pipeline_end_to_end(spark, tmp_path_factory, pages):
    out = str(tmp_path_factory.mktemp("wp_full"))
    stats = wp.run_web_pipeline(spark, pages, out, n_url_buckets=4)
    assert stats[wp.S1]["pending_buckets"] == 4
    assert stats[wp.S3]["ran"] is True
    assert stats[wp.S4]["new_triples"] > 0

    # store contains pattern triples AND canonical-entity mention triples
    keys = _store_key_set(spark, out)
    preds = {p for _, p, _ in keys}
    assert any(p.endswith("hasLine") for p in preds)
    assert any(p.endswith("mentionsEntity") for p in preds)

    # manifest carries per-bucket lineage for every bucketed stage
    man = read_manifest(spark, f"{out}/manifest")
    rows = {(r.stage, r.partition_key): r for r in man.collect()}
    for stage in (wp.S1, wp.S2, wp.S4):
        got = [k for k in rows if k[0] == stage]
        assert len(got) == 4, (stage, got)
    assert all(r.rows_out > 0 for k, r in rows.items() if k[0] == wp.S4)

    # re-run: everything skipped, store unchanged
    stats2 = wp.run_web_pipeline(spark, pages, out, n_url_buckets=4)
    assert stats2[wp.S1]["pending_buckets"] == 0
    assert stats2[wp.S3]["ran"] is False
    assert stats2[wp.S4]["new_triples"] == 0
    assert _store_key_set(spark, out) == keys


def test_pipeline_resume_after_partial_run(spark, tmp_path_factory, pages):
    full = str(tmp_path_factory.mktemp("wp_ref"))
    wp.run_web_pipeline(spark, pages, full, n_url_buckets=4)

    # simulate a crash after S2: only extract+link completed
    part = str(tmp_path_factory.mktemp("wp_part"))
    wp.run_web_pipeline(spark, pages, part, n_url_buckets=4, stages=(wp.S1, wp.S2))
    man = read_manifest(spark, f"{part}/manifest")
    assert man.where(F.col("stage") == wp.S4).count() == 0

    # restart the whole DAG: S1/S2 buckets skip via manifest, S3/S4 complete
    stats = wp.run_web_pipeline(spark, pages, part, n_url_buckets=4)
    assert stats[wp.S1]["pending_buckets"] == 0
    assert stats[wp.S2]["pending_buckets"] == 0
    assert stats[wp.S4]["pending_buckets"] == 4

    # resumed result identical to the uninterrupted run
    assert _store_key_set(spark, part) == _store_key_set(spark, full)


def test_s1_rerun_after_lost_manifest_does_not_duplicate(spark, tmp_path_factory, pages):
    """Crash between the S1 parquet write and the manifest record: the
    resume re-runs the same buckets; dynamic partition overwrite must
    REPLACE their rows, never append duplicates (perturbing S2 TF-IDF)."""
    out = str(tmp_path_factory.mktemp("wp_crash_s1"))
    wp.run_web_pipeline(spark, pages, out, n_url_buckets=4, stages=(wp.S1,))
    docs_once = spark.read.parquet(f"{out}/docs")
    n_once = docs_once.count()
    assert docs_once.select("doc_id").distinct().count() == n_once

    # lose the manifest (the write landed, the record did not)
    import shutil

    shutil.rmtree(f"{out}/manifest")
    wp.run_web_pipeline(spark, pages, out, n_url_buckets=4, stages=(wp.S1,))
    docs_again = spark.read.parquet(f"{out}/docs")
    assert docs_again.count() == n_once
    assert docs_again.select("doc_id").distinct().count() == n_once
