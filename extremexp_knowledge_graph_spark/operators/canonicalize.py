"""S3 CANONICALIZE — entity canonicalization at web scale.

Exact mode (fixture regime) needs no state at all: URI minting is a pure
deterministic function (functions/uri.py), so equal names collapse to equal
IRIs on any executor — the distributed replacement for the reference's
``uri_cache`` memoization (extremexp_kg_matic/src/utils.py:230-246).

Web mode dedupes *near*-equal entities: MinHash-LSH blocking over entity
surface forms proposes same-as edges, and connected components picks one
canonical IRI per component. CC is the one genuinely iterative piece of the
pipeline (SURVEY.md §4.2) — implemented as min-label propagation with
pointer jumping (label[comp] ← label[label[comp]] each round, halving
component depth, O(log d) rounds) and ``localCheckpoint`` per iteration to
cut the lineage that would otherwise grow linearly and blow up the planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.operators.dedup import minhash_dedup_pairs


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, component) with component = min node id of the component.

    Min-label propagation + pointer jumping. Each iteration:
      1. every node takes the min label among itself and its neighbors;
      2. labels compress one hop (comp ← comp's comp).
    Converges in O(log diameter) iterations for the near-clique components
    LSH blocking produces (typically ≤ 3 rounds). Works on any orderable id
    type (numeric or string).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(F.col("a") != F.col("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = (
        sym.select(F.col("a").alias("node"))
        .unionByName(sym.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    if checkpoint:
        sym = sym.localCheckpoint()
        labels = labels.localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
        )
        # pointer jumping: comp ← label(comp)
        jump = labels.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
        new_labels = (
            new_labels.join(jump, "comp", "left")
            .select("node", F.least(F.col("comp"), F.coalesce("comp2", F.col("comp"))).alias("comp"))
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize_entities(
    entities: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "name",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """(entity_id, canonical_id): LSH blocking over surface forms → verify
    with n-gram Jaccard ≥ threshold → connected components → canonical id =
    min entity_id per component. Entities with no near-equal keep themselves.
    """
    # LSH proposes, true Jaccard over candidates only disposes — never the
    # quadratic all-pairs join (that's what blocking is for).
    edges = minhash_dedup_pairs(
        entities,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        n=shingle_n,
        id_col=id_col,
        text_col=name_col,
    ).select("id_a", "id_b")
    comp = connected_components(edges, "id_a", "id_b")
    return (
        entities.select(F.col(id_col).alias("entity_id"))
        .join(comp.withColumnRenamed("node", "entity_id"), "entity_id", "left")
        .select(
            "entity_id",
            F.coalesce("comp", F.col("entity_id")).alias("canonical_id"),
        )
    )
