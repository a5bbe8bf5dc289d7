"""Physical-plan regression guards — the properties BENCH.md's plan review
documents, pinned so a refactor can't silently lose them. These assert plan
SHAPE (pruning, join strategy), not timings, so they are stable across
hosts."""

from __future__ import annotations


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_papers_triples_scans_prune_to_doc_id(spark):
    """The flagship mapper derives everything from doc_id, and Catalyst must
    push that projection into EVERY branch scan — at 100 TB the difference
    between reading one bigint column and reading text is the job."""
    import __spark_entry__ as e

    df = e.queries()["kg_papers_triples"](spark, "/root/testdata/sf0.001")
    plan = _executed_plan(df)
    n_scans = plan.count("FileScan parquet")
    assert n_scans >= 1
    assert plan.count("ReadSchema: struct<doc_id:bigint>") == n_scans, plan[:2000]


def test_sampling_filter_sits_on_the_scan(spark):
    """Deterministic sampling must evaluate its md5-threshold predicate
    directly over the scan — no exchange below the filter (rows drop before
    they could ever shuffle)."""
    from pyspark.sql import functions as F

    from extremexp_knowledge_graph_spark.operators.sampling import deterministic_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _executed_plan(deterministic_sample(docs, 0.1).select("doc_id"))
    assert "Exchange" not in plan, plan[:2000]


def test_ann_broadcasts_queries_not_corpus(spark):
    """Brute-force ANN must broadcast the (tiny) query side; the corpus
    never shuffles for scoring."""
    from pyspark.sql import functions as F

    from extremexp_knowledge_graph_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    plan = _executed_plan(brute_force_topk(emb, q, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]
    # the only exchange is the per-query top-k window, keyed on query_id
    assert plan.count("Exchange hashpartitioning(query_id") >= 1


def test_lsh_near_dup_staging_single_eval(spark, tmp_path):
    """Staged embedding near-dup: the Arrow bucket kernel evaluates once
    (during the staging write) and the self-join plan contains ZERO
    ArrowEvalPython nodes — both sides read the staged parquet. Results
    must equal the unstaged plan exactly."""
    from extremexp_knowledge_graph_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    unstaged = embedding_near_dup_pairs(emb, threshold=0.4, n_planes=4, n_tables=8)
    staged = embedding_near_dup_pairs(
        emb, threshold=0.4, n_planes=4, n_tables=8, staging_path=str(tmp_path / "b")
    )
    plan = _executed_plan(staged)
    assert "ArrowEvalPython" not in plan, plan[:2000]
    assert _executed_plan(unstaged).count("ArrowEvalPython") == 2  # the 2x it saves
    assert sorted(map(tuple, staged.collect())) == sorted(map(tuple, unstaged.collect()))
