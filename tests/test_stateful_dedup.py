"""Cross-batch stateful streaming dedup (streaming/stateful_dedup.py).

The streaming operator must agree with the batch exact-dedup semantics:
one survivor per content fingerprint, min doc_id wins, duplicates arriving
in LATER batches (or after a checkpointed restart) emit nothing.
"""

from __future__ import annotations

from extremexp_knowledge_graph_spark.streaming.stateful_dedup import (
    DOCS_SCHEMA,
    stream_exact_dedup,
)


def _write(spark, inp, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).repartition(1).write.mode("append").parquet(inp)


def test_stream_dedup_across_batches_and_restart(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("inp", "out", "ckpt"))

    # batch 1: A(1), dup-of-A(2), B(3)  — whitespace differences normalize
    _write(spark, inp, [(1, "alpha text"), (2, "alpha   text"), (3, "bravo text")])
    # batch 2 (separate file): dup-of-A(4), C(5)
    _write(spark, inp, [(4, "alpha text"), (5, "charlie text")])

    q = stream_exact_dedup(spark, inp, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got == {1: "alpha text", 3: "bravo text", 5: "charlie text"}, got

    # restart with a third file: another dup of A plus a new doc — state
    # survives via the checkpoint, so only the new doc emerges
    _write(spark, inp, [(6, "alpha text"), (7, "delta text")])
    q2 = stream_exact_dedup(spark, inp, out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(180)
    got2 = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got2 == {1: "alpha text", 3: "bravo text", 5: "charlie text", 7: "delta text"}, got2


def test_stream_dedup_matches_batch_operator(spark, tmp_path):
    """Streaming survivors == batch exact_dedup survivors on the same data."""
    from extremexp_knowledge_graph_spark.operators.dedup import exact_dedup

    inp, out, ckpt = (str(tmp_path / d) for d in ("inp2", "out2", "ckpt2"))
    rows = [(i, f"text {i % 7}") for i in range(40)]
    _write(spark, inp, rows[:25])
    _write(spark, inp, rows[25:])

    q = stream_exact_dedup(spark, inp, out, ckpt)
    q.awaitTermination(180)
    stream_ids = {r.doc_id for r in spark.read.parquet(out).collect()}

    batch = exact_dedup(spark.createDataFrame(rows, DOCS_SCHEMA))
    batch_ids = {r.doc_id for r in batch.collect()}
    assert stream_ids == batch_ids
