"""Golden triple parity — the P/R ≥ 0.95 correctness gate (SURVEY.md §5.2).

Runs the Spark mapper on the reference's own fixture corpus
(five_papers.json) and compares the emitted triple set against the
reference's checked-in golden output (five_papers.ttl, produced by
extremexp_kg_matic/src/utils.py:209-365). Deterministic mapping → we assert
exact match, which trivially satisfies P/R ≥ 0.95.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import REFERENCE_DATA
from tests.ttl_oracle import load_golden

FIVE_PAPERS_JSON = os.path.join(REFERENCE_DATA, "five_papers.json")
FIVE_PAPERS_TTL = os.path.join(REFERENCE_DATA, "five_papers.ttl")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIVE_PAPERS_JSON), reason="reference fixture not available"
)


def _spark_triples(spark):
    from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
    from extremexp_knowledge_graph_spark.sources.papers_json import read_papers_json

    papers = read_papers_json(spark, FIVE_PAPERS_JSON)
    rows = papers_to_triples(papers).collect()
    return {(r.subj, r.pred, r.obj, r.obj_is_iri, r.obj_datatype) for r in rows}


def test_golden_triple_parity(spark):
    got = _spark_triples(spark)
    want = load_golden(FIVE_PAPERS_TTL)
    missing = want - got
    extra = got - want
    precision = len(got & want) / len(got) if got else 0.0
    recall = len(got & want) / len(want) if want else 0.0
    detail = (
        f"P={precision:.4f} R={recall:.4f} got={len(got)} want={len(want)}\n"
        f"missing (first 10): {sorted(missing)[:10]}\n"
        f"extra   (first 10): {sorted(extra)[:10]}"
    )
    assert precision >= 0.95 and recall >= 0.95, detail
    # deterministic mapping: expect exact equality, not just the 0.95 gate
    assert not missing and not extra, detail


def test_mapper_idempotent_under_reprocessing(spark):
    """Re-running the mapper and merging adds zero new triples (E2/E3)."""
    from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
    from extremexp_knowledge_graph_spark.sources.papers_json import read_papers_json
    from extremexp_knowledge_graph_spark.schema import TRIPLE_KEY

    papers = read_papers_json(spark, FIVE_PAPERS_JSON)
    t1 = papers_to_triples(papers)
    doubled = t1.unionByName(t1).dropDuplicates(TRIPLE_KEY)
    assert doubled.count() == t1.count()


def test_upload_source_all_payload_shapes(spark, tmp_path):
    """A4 multipart upload: bytes → persisted file → same schema-enforced
    scan as A1. Array payloads, single-object auto-wrap, and corrupt
    payloads (quarantine row, no exception) all ride the one door."""
    import json

    from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
    from extremexp_knowledge_graph_spark.sources.papers_json import CORRUPT_COL, ingest_upload

    updir = str(tmp_path / "uploads")
    arr = json.dumps(
        [{"title": "Upload A", "tasks": ["T"]}, {"title": "Upload B", "year": 2020}]
    ).encode()
    papers = ingest_upload(spark, arr, updir, name="batch.json")
    assert papers.count() == 2
    triples = papers_to_triples(papers)
    assert triples.where(triples.obj == "Upload A").count() == 1

    single = json.dumps({"title": "Solo Upload"}).encode()
    solo = ingest_upload(spark, single, updir, name="solo.json")
    assert solo.count() == 1 and solo.first().title == "Solo Upload"

    bad = ingest_upload(spark, b"{broken json", updir, name="bad.json", with_corrupt=True)
    rows = bad.collect()
    assert len(rows) == 1 and rows[0][CORRUPT_COL] is not None
