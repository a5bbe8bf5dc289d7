"""Web-regime tests: synthetic pages, byte-identical extraction, SVO/gazetteer
pattern extraction vs a pure-Python restatement of the reference semantics
(extremexp_kg_matic/src/utils.py:26-114)."""

from __future__ import annotations

import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.operators.html_extract import extract_text, extract_text_str
from extremexp_knowledge_graph_spark.operators.pattern_extract import (
    SVO_VERBS,
    gazetteer_mentions,
    line_triples,
    svo_matches,
    svo_triples,
)
from extremexp_knowledge_graph_spark.schema import EX2, RDF_TYPE
from extremexp_knowledge_graph_spark.sources.synthetic_pages import GAZETTEER, generate_pages


def test_extract_byte_identical_per_url(spark):
    pages = generate_pages(spark, 60, seed=42, partitions=4)
    mismatches = (
        pages.withColumn("ex", extract_text(F.col("html")))
        .where(F.col("ex") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_pages_deterministic_across_partitioning(spark):
    a = {r.url: (bytes(r.html), r.text) for r in generate_pages(spark, 30, partitions=1).collect()}
    b = {r.url: (bytes(r.html), r.text) for r in generate_pages(spark, 30, partitions=7).collect()}
    assert a == b


def test_extract_strips_boilerplate(spark):
    html = (
        "<html><head><script>junk()</script><style>b{}</style></head><body>"
        "<nav><a>x</a></nav><main><article><p>hello &amp; goodbye</p>"
        "<p>second  para</p></article></main><footer>foot</footer></body></html>"
    )
    assert extract_text_str(html) == "hello & goodbye\n\nsecond para"


# --- SVO reference restatement (src/utils.py:67-106) ------------------------
def py_svo(text: str):
    out = []
    for i, line in enumerate(text.split("\n")):
        line = line.strip()
        if not line:
            continue
        for verb in SVO_VERBS:
            for m in re.findall(rf"(\w+)\s+{verb}\s+(\w+)", line, re.IGNORECASE):
                out.append((i + 1, verb, m[0].lower(), m[1].lower()))
    return sorted(out)


SVO_TEXT = (
    "The model is fast and the Cache HAS memory\n"
    "\n"
    "pipeline contains encoder. encoder uses attention\n"
    "system implements dropout; dropout includes noise\n"
    "a is b is c\n"  # overlap: findall consumes — expect only (a,b)
)


def test_svo_matches_reference_semantics(spark):
    df = spark.createDataFrame([Row(doc_id=7, text=SVO_TEXT)])
    got = sorted(
        (r.line_no, r.verb, r.subj_tok, r.obj_tok)
        for r in svo_matches(df).collect()
    )
    assert got == py_svo(SVO_TEXT)


def test_svo_triples_shape(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="alpha is beta")])
    rows = {(r.subj, r.pred, r.obj) for r in svo_triples(df).collect()}
    assert (EX2 + "alpha", RDF_TYPE, EX2 + "beta") in rows  # 'is' → rdf:type
    rel = EX2 + "document_1_relationship_alpha_beta_1"
    assert (rel, RDF_TYPE, EX2 + "Relationship") in rows
    assert (rel, EX2 + "hasSubject", EX2 + "alpha") in rows
    assert (rel, EX2 + "hasObject", EX2 + "beta") in rows
    assert (rel, EX2 + "foundInLine", EX2 + "document_1_line_1") in rows
    assert len(rows) == 5


def test_line_triples(spark):
    df = spark.createDataFrame([Row(doc_id=3, text="one\n\n  two  ")])
    rows = {(r.subj, r.pred, r.obj) for r in line_triples(df).collect()}
    doc = EX2 + "document_3"
    assert (doc, RDF_TYPE, EX2 + "Document") in rows
    assert (doc, EX2 + "hasLine", EX2 + "document_3_line_1") in rows
    # blank middle line is skipped but positions still count it (1-based)
    assert (doc, EX2 + "hasLine", EX2 + "document_3_line_3") in rows
    assert (EX2 + "document_3_line_3", EX2 + "hasText", "two") in rows


def test_gazetteer_mentions(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="we train ResNet with adam"), Row(doc_id=2, text="no entities here")]
    )
    rows = {(r.subj, r.obj) for r in gazetteer_mentions(df, GAZETTEER).collect()}
    assert rows == {
        (EX2 + "document_1", EX2 + "Term_ResNet"),
        (EX2 + "document_1", EX2 + "Term_Adam"),
    }


def test_svo_on_synthetic_pages_matches_python(spark):
    pages = generate_pages(spark, 20, partitions=3).select(
        F.col("url").alias("doc_id"), "text"
    )
    got = sorted(
        (r.doc_id, r.line_no, r.verb, r.subj_tok, r.obj_tok) for r in svo_matches(pages).collect()
    )
    want = []
    for r in pages.collect():
        want.extend((r.doc_id, *m) for m in py_svo(r.text))
    assert got == sorted(want)
    assert len(got) > 20  # generator actually embeds the grammar
