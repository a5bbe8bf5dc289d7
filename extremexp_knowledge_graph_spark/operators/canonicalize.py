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

from extremexp_knowledge_graph_spark.operators.dedup import (
    minhash_dedup_pairs,
    minhash_pairs_between,
)


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


def canonicalize_entities_incremental(
    new_entities: DataFrame,
    existing_entities: DataFrame,
    existing_map: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "name",
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 2,
    existing_band_rows: DataFrame | None = None,
) -> DataFrame:
    """Canonicalize a NEW batch against an already-canonicalized corpus:
    (entity_id, canonical_id) for the new entities only.

    The incremental-ER contract (the resume-path counterpart of
    ``canonicalize_entities``, needed because re-clustering 10^9 historical
    entities per ingest batch is not an option and already-materialized
    canonical IRIs must not be rewritten):

    * **Stability** — ``existing_map`` rows never change; this function only
      ASSIGNS the delta. A new entity bridging two existing groups does NOT
      merge them (that would rewrite stored triples); the bridge resolves to
      the minimum canonical id and the residual merge belongs to the next
      full recanonicalization — the standard incremental compromise.
    * **Adoption** — a new entity near-equal (LSH + Jaccard ≥ threshold, the
      same blocking as the batch path) to ≥1 existing entity adopts the
      minimum canonical id among its matches.
    * **Transitivity within the batch** — connected components run over
      new↔new edges; a component adopts the minimum canonical any member
      adopted, so a chain new₂—new₁—old resolves new₂ to old's canonical
      even though new₂ matched no existing entity directly.
    * **Novel entities** — components (or singletons) with no adoption get
      canonical = min new entity_id, exactly like the batch path.

    Scale shape: the only work touching the history is ONE cross-set
    band-bucket join (``minhash_pairs_between`` — the history never
    self-joins) plus one broadcast-size join from matches to their map rows;
    everything else is O(batch). Pass ``existing_band_rows`` — the persisted
    ``(id, band, band_sig)`` signature table (``dedup.minhash_band_rows``,
    maintained append-only by the ingest pipeline) — and the history is
    never re-shingled or re-min-hashed either: its cost drops to one
    columnar signature scan + a semi-join-pruned read of the candidate
    entities' names for Jaccard verification.
    """
    new_e = new_entities.select(F.col(id_col).alias("entity_id"), F.col(name_col).alias("name"))
    old_e = existing_entities.select(F.col(id_col).alias("entity_id"), F.col(name_col).alias("name"))

    # 1) direct adoption edges: new → existing → existing canonical
    adopt_edges = minhash_pairs_between(
        new_e, old_e, threshold=threshold, num_hashes=num_hashes,
        bands=bands, n=shingle_n, id_col="entity_id", text_col="name",
        right_band_rows=existing_band_rows,
    )
    direct = (
        adopt_edges.join(
            existing_map.select(F.col("entity_id").alias("id_b"), "canonical_id"), "id_b"
        )
        .groupBy(F.col("id_a").alias("entity_id"))
        .agg(F.min("canonical_id").alias("adopt_c"))
    )

    # 2) new↔new components (same blocking as the batch path)
    new_edges = minhash_dedup_pairs(
        new_e, threshold=threshold, num_hashes=num_hashes,
        bands=bands, n=shingle_n, id_col="entity_id", text_col="name",
    ).select("id_a", "id_b")
    comp = connected_components(new_edges, "id_a", "id_b").withColumnRenamed("node", "entity_id")

    # 3) resolve: component-level min adoption, else component min id, else self
    base = (
        new_e.select("entity_id")
        .join(comp, "entity_id", "left")
        .withColumn("comp", F.coalesce("comp", F.col("entity_id")))
    )
    comp_adopt = (
        base.join(direct, "entity_id", "left")
        .groupBy("comp")
        .agg(F.min("adopt_c").alias("comp_c"))  # min ignores NULLs; all-NULL → NULL
    )
    return base.join(comp_adopt, "comp", "left").select(
        "entity_id", F.coalesce("comp_c", F.col("comp")).alias("canonical_id")
    )
