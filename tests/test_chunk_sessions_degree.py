"""Chunking, sessionization, and degree centrality — semantics + plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_chunk_documents_window_semantics(spark):
    from extremexp_knowledge_graph_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),          # 7 tokens
            (2, "one two"),                 # shorter than the window
            (3, ""),                        # empty → no chunks
            (4, "x " * 6),                  # exactly 2*stride tokens
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_text)
         for r in chunk_documents(docs, window=4, stride=3).collect())
    )
    assert rows == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),   # overlap of window - stride = 1 token
        (1, 2, 6, 1, "g"),         # short tail
        (2, 0, 0, 2, "one two"),
        (4, 0, 0, 4, "x x x x"),
        (4, 1, 3, 3, "x x x"),
    ]


def test_chunk_documents_no_shuffle(spark):
    """Chunking is a narrow transform: the executed plan must contain no
    Exchange — at 100 TB it runs scan→project with zero data movement."""
    from extremexp_knowledge_graph_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_sessionize_gap_semantics(spark):
    """Session merge boundary, pinned against Spark itself: a gap of
    exactly `gap` still merges (touching windows), only a strictly larger
    gap starts a new session; end = last event + gap. The driver oracle's
    `> INTERVAL` break mirrors exactly this."""
    from extremexp_knowledge_graph_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)
    events = spark.createDataFrame(
        [
            (1, 10, mins(0), 1.0),
            (2, 10, mins(29), 2.0),      # 29 < 30 → same session
            (3, 10, mins(59), 3.0),      # exactly 30 → STILL merges
            (4, 10, mins(90), 4.0),      # 31 > 30 → new session
            (5, 20, mins(0), 5.0),       # other user independent
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize(events, gap="30 minutes", value_col="value").collect()
    }
    assert got == {
        (10, mins(0), mins(89), 3, 6.0),
        (10, mins(90), mins(120), 1, 4.0),
        (20, mins(0), mins(30), 1, 5.0),
    }


def test_degree_topk_counts(spark):
    from extremexp_knowledge_graph_spark.plans.queries import degree_topk

    # object-side nodes come from the explicit obj_is_iri flag: https IRIs
    # count toward in-degree, literals that merely look like IRIs do not
    t = spark.createDataFrame(
        [
            ("http://a", "p", "http://b", True),
            ("http://a", "p", "http://c", True),
            ("http://b", "p", "http://a", True),
            ("http://a", "q", "literal value", False),      # no in-degree
            ("http://a", "q", "http://not-a-node", False),  # literal despite prefix
            ("http://c", "p", "https://s", True),           # https IS a node
        ],
        ["subj", "pred", "obj", "obj_is_iri"],
    )
    rows = [(r.node, r.out_degree, r.in_degree, r.degree) for r in degree_topk(t, k=2).collect()]
    assert rows == [("http://a", 4, 1, 5), ("http://b", 1, 1, 2)]


def test_chunk_curation_composition_no_python(spark):
    """The composed curation → chunk → fingerprint driver row is ONE Spark
    plan with zero Python boundaries: no ArrowEvalPython / BatchEvalPython
    anywhere in the executed plan (everything — quality score, lang id,
    dedup keeper join, token windows, md5 rollup — is native expressions)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_chunk_curation"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan[:2000]
    assert df.count() > 0


def test_sessionize_two_phase_equals_one_phase(spark):
    """The hot-key-safe two-phase sessionizer is bit-identical to the
    native one-phase session_window on data built to stress every merge
    edge: a session spanning five 6h buckets (hot user), sessions touching
    EXACTLY at a bucket boundary (gap == 30min must merge), separate
    sessions within and across buckets, and exact decimal value sums."""
    import datetime as dt

    from extremexp_knowledge_graph_spark.operators.sessions import (
        sessionize,
        sessionize_two_phase,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # hot user: events every 20min for 30h → ONE session spanning 5 buckets
    rows += [(1, t0 + dt.timedelta(minutes=20 * i), float(i % 7)) for i in range(90)]
    # exact-touch across the 6h bucket boundary: 5:50 → 6:20 is exactly 30min
    rows += [(2, t0 + dt.timedelta(hours=5, minutes=50), 1.5),
             (2, t0 + dt.timedelta(hours=6, minutes=20), 2.25),
             (2, t0 + dt.timedelta(hours=9), 3.0)]
    # separate sessions across buckets
    rows += [(3, t0, 1.0), (3, t0 + dt.timedelta(hours=7), 2.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])

    one = sorted(map(tuple, sessionize(df, value_col="value").collect()))
    two = sorted(map(tuple, sessionize_two_phase(df, value_col="value").collect()))
    assert one == two
    # the hot user's 30h run merged into a single session in both
    assert sum(1 for r in one if r[0] == 1) == 1
    # user 2's exact-touch boundary pair merged (2 sessions, not 3)
    assert sum(1 for r in one if r[0] == 2) == 2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sessionize_two_phase(df, gap="30 minutes", bucket="10 minutes")


def test_pagerank_topk_small_graph(spark):
    """pagerank_topk on a hand-checkable graph vs an independent pure-Python
    power iteration (same damped unnormalized form, contributions summed in
    source order): a 3-cycle with an extra feeder and a dangling sink."""
    from extremexp_knowledge_graph_spark.plans.queries import pagerank_topk

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("f", "a")]
    t = spark.createDataFrame(
        [(s, "p", o, True) for s, o in edges], ["subj", "pred", "obj", "obj_is_iri"]
    )
    got = {r.node: r.rank for r in pagerank_topk(t, k=10, iters=10, alpha=0.85).collect()}

    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {n: 1.0 for n in nodes}
    for _ in range(10):
        nxt = {}
        for n in nodes:
            s = 0.0
            for src, dst in sorted(edges):  # source order, like _sorted_fold
                if dst == n:
                    s = s + r[src] / out[src]
            nxt[n] = (1 - 0.85) + 0.85 * s
        r = nxt
    want = {n: round(v, 6) for n, v in r.items()}
    assert got == want
    # sanity: the cycle members outrank the dangling sink's feeder-less node
    assert got["a"] > got["d"] and got["f"] == round(1 - 0.85, 6)
