"""Property/metamorphic tests for the scalar kernels (SURVEY.md §5.2 item 2).

Each kernel is checked against an inline pure-Python re-statement of the
reference semantics (extremexp_kg_matic/src/utils.py:14-24, 165-207, 322-340)
over adversarial inputs: Unicode word chars, ±, %, arXiv URL corner cases,
falsy values.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.functions.uri import entity_uri, paper_uri, sanitize_for_uri
from extremexp_knowledge_graph_spark.functions.values import parse_metric_value, parse_rank
from extremexp_knowledge_graph_spark.functions.year import year_from_pdf_url
from extremexp_knowledge_graph_spark.schema import NS, XSD_DECIMAL, XSD_STRING


# --- pure-Python restatements of the reference semantics -------------------
def py_sanitize(text):
    # src/utils.py:14-24
    if not text:
        return "unknown"
    text = re.sub(r"[^\w\s-]", "", str(text).strip())
    text = re.sub(r"[-\s]+", "_", text)
    return text if text else "sanitized_empty"


def py_year(url):
    # src/utils.py:165-207
    if not url:
        return None
    m = re.search(r"arxiv\.org/pdf/(\d{2})(\d{2})\.\d+", url, re.IGNORECASE)
    if m:
        yy, mm = int(m.group(1)), int(m.group(2))
        if 1 <= mm <= 12:
            return str(1900 + yy if yy >= 90 else 2000 + yy)
    matches = re.findall(r"\b(19\d{2}|20\d{2})\b", url)
    return matches[-1] if matches else None


def py_value(s):
    # src/utils.py:322-334
    if "%" in s:
        try:
            return str(float(s.replace("%", "").strip()) / 100.0), "decimal"
        except ValueError:
            return s, "string"
    try:
        return str(float(s)), "decimal"
    except ValueError:
        return s, "string"


SANITIZE_CASES = [
    "Swin Transformer: Hierarchical Vision Transformer using Shifted Windows",
    "CIFAR-10",
    "D&D",
    "Brazil Air-Traffic",
    "29 ± 3",
    "CiteSeer (60%/20%/20% random splits)",
    "  leading and trailing  ",
    "---",
    "%&*",
    "naïve Bayes über alles",  # unicode word chars
    "模型 分类",  # CJK word chars
    "a-b c_d",
    "Adam",
    "",
    None,
    "ResNet‐50",  # U+2010 hyphen (not ASCII '-')
    "tab\tand\nnewline",
]

YEAR_CASES = [
    "https://arxiv.org/pdf/1907.11692v1.pdf",
    "https://arxiv.org/pdf/2103.14030v2.pdf",
    "https://arxiv.org/pdf/9912.00001.pdf",   # 1999
    "https://arxiv.org/pdf/9013.00001.pdf",   # month 13 invalid → fallback
    "https://ARXIV.org/PDF/2012.07436v3.pdf",  # case-insensitive
    "https://example.com/papers/2015/paper-1998.pdf",  # fallback: last year
    "https://example.com/no-year-here/12345.pdf",
    "http://arxiv.org/pdf/0704.0001v1",       # 2007
    "https://example.com/1899-2100.pdf",      # out-of-range years
    "",
    None,
]

VALUE_CASES = [
    "53.50", "87.3%", "197M", "29 ± 3", "YES", "0.779", "83.0% ± 0.7%",
    "72.5 ± 0.7%", "11030210", "58.10", "1_000", "  42 ", "inf", "nan",
    "1e-3", "95 %", "%", "0.873",
]

RANK_CASES = ["75", "1", " 42 ", "+7", "-3", "75.0", "first", "1e2", "0", "００７"]


def test_sanitize_matches_reference(spark):
    df = spark.createDataFrame([Row(x=c) for c in SANITIZE_CASES])
    got = [r.s for r in df.select(sanitize_for_uri(F.col("x")).alias("s")).collect()]
    want = [py_sanitize(c) for c in SANITIZE_CASES]
    assert got == want


def test_year_matches_reference(spark):
    df = spark.createDataFrame([Row(x=c) for c in YEAR_CASES])
    got = [r.y for r in df.select(year_from_pdf_url(F.col("x")).alias("y")).collect()]
    want = [py_year(c) for c in YEAR_CASES]
    assert got == want


def test_value_parse_matches_reference(spark):
    df = spark.createDataFrame([Row(x=c) for c in VALUE_CASES])
    got = df.select(parse_metric_value(F.col("x")).alias("v")).collect()
    for case, row in zip(VALUE_CASES, got):
        lex, dt = py_value(case)
        full_dt = XSD_DECIMAL if dt == "decimal" else XSD_STRING
        assert (row.v.lexical, row.v.datatype) == (lex, full_dt), case


def test_rank_parse_matches_reference(spark):
    df = spark.createDataFrame([Row(x=c) for c in RANK_CASES])
    got = [r.l for r in df.select(parse_rank(F.col("x")).alias("l")).collect()]
    for case, lex in zip(RANK_CASES, got):
        try:
            want = str(int(case))
        except ValueError:
            want = None
        assert lex == want, case


def test_uri_minting(spark):
    df = spark.createDataFrame([Row(title="Graph Attention Networks", name="CIFAR-10")])
    row = df.select(
        paper_uri(F.col("title")).alias("p"),
        entity_uri("Dataset", F.col("name")).alias("d"),
    ).first()
    assert row.p == NS + "Paper_Graph_Attention_Networks"
    assert row.d == NS + "Dataset_CIFAR_10"


def test_paper_uri_missing_vs_empty_title(spark):
    """Missing title → Paper_Unknown; empty title → Paper_unknown
    (src/utils.py:255 default vs sanitize falsy branch)."""
    df = spark.createDataFrame([Row(title=None), Row(title="")])
    got = sorted(r.p for r in df.select(paper_uri(F.col("title")).alias("p")).collect())
    assert got == sorted([NS + "Paper_Unknown", NS + "Paper_unknown"])


def test_sanitize_idempotent(spark):
    df = spark.createDataFrame([Row(x=c) for c in SANITIZE_CASES if c])
    once = df.select(sanitize_for_uri(F.col("x")).alias("s"))
    twice = once.select(sanitize_for_uri(F.col("s")).alias("s"))
    assert [r.s for r in once.collect()] == [r.s for r in twice.collect()]


def test_validate_triples_strict_char_gate(spark):
    """B5 (src/utils.py:116-142, opt-in): strict mode drops s/p/o containing
    <>"\\ or control chars or shorter than 2; B4 alone keeps them."""
    from extremexp_knowledge_graph_spark.operators.papers_to_triples import validate_triples
    from extremexp_knowledge_graph_spark.schema import TRIPLE_SCHEMA

    rows = [
        ("http://e/s", "http://e/p", "fine", False, None, None),
        ("http://e/s", "http://e/p", 'has"quote', False, None, None),
        ("http://e/s", "http://e/p", "tab\there", False, None, None),
        ("http://e/s", "http://e/p", "x", False, None, None),
        ("", "http://e/p", "dropped by B4 too", False, None, None),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    assert validate_triples(df).count() == 4          # B4: only empty-subj dropped
    got = validate_triples(df, strict=True).collect() # B5: char/length gate
    assert len(got) == 1 and got[0].obj == "fine"


def test_token_counters(spark):
    """Whitespace vs BPE-ish piece counts on contraction/punct/unicode cases."""
    from pyspark.sql import Row

    from extremexp_knowledge_graph_spark.functions.text import (
        bpe_ish_token_count,
        whitespace_token_count,
    )

    cases = [
        ("hello world", 2, 2),
        ("don't stop", 2, 3),          # don / 't / stop
        ("a,b", 1, 3),                 # a / , / b
        ("  padded   runs  ", 2, 2),
        ("naïve café", 2, 2),          # unicode letters stay one piece
        ("x2 42", 2, 3),               # x / 2 / 42 (digit runs split off)
        ("", 0, 0),
    ]
    df = spark.createDataFrame([Row(i=i, t=t) for i, (t, _, _) in enumerate(cases)])
    got = {
        r.i: (r.ws, r.bpe)
        for r in df.select(
            "i",
            whitespace_token_count(F.col("t")).alias("ws"),
            bpe_ish_token_count(F.col("t")).alias("bpe"),
        ).collect()
    }
    for i, (t, ws, bpe) in enumerate(cases):
        assert got[i] == (ws, bpe), (t, got[i], (ws, bpe))
