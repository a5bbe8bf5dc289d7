"""Connected components vs a union-find oracle; entity canonicalization;
relational TF-IDF linker."""

from __future__ import annotations

from pyspark.sql import Row

from extremexp_knowledge_graph_spark.operators.canonicalize import (
    canonicalize_entities,
    connected_components,
)
from extremexp_knowledge_graph_spark.operators.linker import link_mentions, tfidf_weights


def uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


EDGES = [
    (1, 2), (2, 3), (3, 4),            # chain → diameter test
    (10, 11), (11, 10),                # dup/reverse edges
    (20, 20),                          # self loop (dropped)
    (30, 31), (32, 33), (31, 32),      # merged late
    (40, 41),
]


def test_connected_components_matches_union_find(spark):
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in EDGES])
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    want = uf_components([e for e in EDGES if e[0] != e[1]])
    assert got == want


def test_connected_components_string_ids(spark):
    edges = spark.createDataFrame(
        [Row(src="task_nlp", dst="task_NLP"), Row(src="task_NLP", dst="task_nlp2")]
    )
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert len(set(got.values())) == 1
    assert min(got) == got["task_nlp"]


def test_canonicalize_entities(spark):
    ents = spark.createDataFrame(
        [
            Row(entity_id=1, name="image classification"),
            Row(entity_id=2, name="Image Classification"),   # case variant
            Row(entity_id=3, name="image classification task"),  # superstring
            Row(entity_id=4, name="machine translation"),
            Row(entity_id=5, name="graph attention networks"),
        ]
    )
    got = {r.entity_id: r.canonical_id for r in canonicalize_entities(ents, shingle_n=2, threshold=0.5).collect()}
    assert got[1] == got[2] == 1      # variants collapse to min id
    assert got[4] == 4 and got[5] == 5  # singletons keep themselves
    assert len(got) == 5              # every entity gets a canonical id


def test_canonicalize_entities_incremental(spark):
    """Incremental-ER contract (operators/canonicalize.py::
    canonicalize_entities_incremental): adoption of existing canonicals,
    within-batch transitivity reaching an adopted canonical, novel
    components keeping min new id, and singleton fall-through."""
    from extremexp_knowledge_graph_spark.operators.canonicalize import (
        canonicalize_entities_incremental,
    )

    old = spark.createDataFrame(
        [
            Row(entity_id="e1", name="image classification"),
            Row(entity_id="e2", name="Image Classification"),
            Row(entity_id="e9", name="machine translation"),
        ]
    )
    emap = spark.createDataFrame(
        [
            Row(entity_id="e1", canonical_id="e1"),
            Row(entity_id="e2", canonical_id="e1"),
            Row(entity_id="e9", canonical_id="e9"),
        ]
    )
    new = spark.createDataFrame(
        [
            # near 'image classification' → adopts e1
            Row(entity_id="n1", name="image classification tasks"),
            # J=2/3 with n1 but only 1/3 with old e1 (< threshold) →
            # adoption must arrive TRANSITIVELY through n1's component
            Row(entity_id="n2", name="image classification tasks new"),
            # novel pair → component canonical = min(n3, n4) = n3
            Row(entity_id="n3", name="graph attention networks"),
            Row(entity_id="n4", name="Graph Attention Networks v2"),
            # novel singleton → itself
            Row(entity_id="n5", name="reinforcement learning"),
        ]
    )
    got = {
        r.entity_id: r.canonical_id
        for r in canonicalize_entities_incremental(
            new, old, emap, shingle_n=2, threshold=0.4
        ).collect()
    }
    assert set(got) == {"n1", "n2", "n3", "n4", "n5"}  # delta only, old untouched
    assert got["n1"] == "e1"
    assert got["n2"] == "e1", got  # transitive through n1
    assert got["n3"] == "n3" and got["n4"] == "n3"
    assert got["n5"] == "n5"


def test_tfidf_weights_l2_normalized(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="spark spark hash"), Row(doc_id=2, text="hash join")]
    )
    rows = tfidf_weights(docs, "doc_id", "text").collect()
    import collections

    norms = collections.defaultdict(float)
    for r in rows:
        norms[r.id] += r.w * r.w
    for v in norms.values():
        assert abs(v - 1.0) < 1e-9


def test_link_mentions_prefers_context_match(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="jaguar fast cat jungle predator"),
            Row(doc_id=2, text="jaguar engine car speed road"),
        ]
    )
    aliases = spark.createDataFrame(
        [
            Row(alias="jaguar", entity_id=100, entity_name="Jaguar (animal)", prior=0.5,
                context="big cat predator jungle animal"),
            Row(alias="jaguar", entity_id=200, entity_name="Jaguar (car)", prior=0.5,
                context="car engine vehicle speed road"),
        ]
    )
    got = {r.doc_id: r.entity_id for r in link_mentions(docs, aliases).collect()}
    assert got == {1: 100, 2: 200}


def test_link_mentions_prior_breaks_cosine_ties(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="python")])
    aliases = spark.createDataFrame(
        [
            Row(alias="python", entity_id=1, entity_name="Python (language)", prior=0.9,
                context="unrelated words entirely"),
            Row(alias="python", entity_id=2, entity_name="Python (snake)", prior=0.1,
                context="different unrelated tokens"),
        ]
    )
    got = link_mentions(docs, aliases).collect()
    assert len(got) == 1 and got[0].entity_id == 1


def test_tfidf_max_df_cap_drops_boilerplate_tokens(spark):
    """Tokens above the document-frequency cap leave the vocabulary (skew
    guard); rarer tokens keep their weight mass (renormalized)."""
    from extremexp_knowledge_graph_spark.operators.linker import tfidf_weights

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"boiler common token{i}") for i in range(4)]
    )
    uncapped = tfidf_weights(docs, "doc_id", "text")
    assert uncapped.where(uncapped.tok == "boiler").count() == 4
    capped = tfidf_weights(docs, "doc_id", "text", max_df_frac=0.5)
    toks = {r.tok for r in capped.collect()}
    assert "boiler" not in toks and "common" not in toks
    assert {f"token{i}" for i in range(4)} <= toks
    # renormalized: each doc's surviving vector is unit length
    from pyspark.sql import functions as F

    norms = capped.groupBy("id").agg(F.sqrt(F.sum(capped.w * capped.w)).alias("n")).collect()
    assert all(abs(r.n - 1.0) < 1e-9 for r in norms)
