"""The web-regime DAG: extract → link → canonicalize → materialize (S1-S4).

This is the end-to-end pipeline the north star describes, over the
Common-Crawl-style ``pages(url, warc_ts, html, text, lang)`` relation
(BASELINE.json input_hint) — the Spark-native replacement for the
reference's watch→validate→transform→dedupe→load loop
(extremexp_kg_matic/src/file_watcher.py:204-329 + src/kg_service.py:141-211),
generalized from trusted JSON metadata to raw web pages:

  S1 EXTRACT      html → text (Arrow kernel, byte-identical per url,
                  operators/html_extract.py) → docs table
  S2 LINK         alias candidate generation + TF-IDF cosine + prior
                  scoring (operators/linker.py) → linked mentions table
  S3 CANONICALIZE MinHash-LSH blocking + connected components over entity
                  surface forms (operators/canonicalize.py) → entity map
  S4 MATERIALIZE  line/SVO/mention triple projection with canonical IRIs →
                  validate → idempotent merge into the bucketed triple
                  store (plans/kg_store.py)

Resume contract (north rule "resumable from checkpoint with per-partition
lineage + metrics"): work is keyed by ``url_bucket = pmod(xxhash64(url), K)``.
Each stage processes ALL pending buckets in ONE Spark job (never a driver
loop over buckets), then appends one manifest row per bucket with
rows_in/rows_out/wall and the bucket's input FINGERPRINT
(``count:bit_xor(xxhash64(key))``). A restarted run anti-joins its input against
the manifest and recomputes only buckets that never completed — or whose
fingerprint changed, which is how INCREMENTAL INGEST works: new pages
re-open exactly the buckets they hash into, dynamic partition overwrite
replaces those buckets' docs/linked rows, the S3 delta pass assigns
canonical ids to newly seen entities (append-only, stability contract), and
S4's set-merge inserts only genuinely new triples. A crash between write
and manifest append cannot duplicate anything.

S3 is deliberately a single global unit (partition_key="global"): connected
components is a cross-bucket fixpoint, so its resume granularity is the
stage, not the bucket — re-running it is cheap relative to extraction and
its input (distinct surface forms) is orders of magnitude smaller than the
corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.operators.canonicalize import canonicalize_entities
from extremexp_knowledge_graph_spark.operators.html_extract import extract_text
from extremexp_knowledge_graph_spark.operators.linker import link_mentions
from extremexp_knowledge_graph_spark.operators.papers_to_triples import validate_triples
from extremexp_knowledge_graph_spark.operators.pattern_extract import line_triples, svo_triples
from extremexp_knowledge_graph_spark.plans import kg_store, manifest
from extremexp_knowledge_graph_spark.schema import EX2, RDF_TYPE, TRIPLE_KEY
from extremexp_knowledge_graph_spark.sources.synthetic_pages import GAZETTEER

DEFAULT_URL_BUCKETS = 16

S1, S2, S3, S4 = "s1_extract", "s2_link", "s3_canonicalize", "s4_materialize"
ALL_STAGES = (S1, S2, S3, S4)


def _bucketed(df: DataFrame, key: str, n: int) -> DataFrame:
    return df.withColumn("url_bucket", F.pmod(F.xxhash64(key), F.lit(n)))


def _pending(
    spark: SparkSession, man_path: str, stage: str, df: DataFrame, fp_col: str = "url"
) -> tuple[DataFrame, list[int], dict[str, str]]:
    """Filter df to buckets pending for ``stage``: never completed, OR
    completed against a DIFFERENT input fingerprint (incremental ingest —
    new/changed rows re-open exactly their buckets; S1/S2's dynamic
    partition overwrite and S4's set-merge make the re-run replace, never
    duplicate). The fingerprint is an order/partitioning-independent digest
    of the bucket's key column: ``count:bit_xor(xxhash64(key))`` (xor, not
    sum — a 64-bit sum overflows under ANSI mode; keys are distinct per
    bucket so xor cancellation needs a hash collision, and the count guards
    multiplicity regardless).

    Returns (pending rows, pending bucket ids, fingerprint per bucket)."""
    keys = df.groupBy(F.col("url_bucket").cast("string").alias("partition_key")).agg(
        F.concat_ws(":", F.count("*"), F.expr(f"bit_xor(xxhash64({fp_col}))")).alias("fp")
    )
    pend = manifest.pending_keys(spark, man_path, stage, keys)
    rows = pend.collect()  # bucket ids: small by design
    pend_list = [int(r.partition_key) for r in rows]
    fps = {r.partition_key: r.fp for r in rows}
    return df.where(F.col("url_bucket").isin(pend_list)), pend_list, fps


def _read_buckets(spark: SparkSession, path: str, buckets: list[int]) -> DataFrame:
    """Read only the given ``url_bucket`` partitions — the filter is a
    partition-pruning predicate, so cost is O(delta), never O(store)."""
    return spark.read.parquet(path).where(F.col("url_bucket").isin(buckets))


def _bucket_counts(df: DataFrame, out_col: str = "rows_out") -> dict[str, int]:
    return {
        str(r.url_bucket): r.n
        for r in df.groupBy("url_bucket").agg(F.count("*").alias("n")).collect()
    }


def _record(
    spark: SparkSession,
    man_path: str,
    stage: str,
    in_counts: dict[str, int],
    out_counts: dict[str, int],
    wall_ms: int,
    buckets: list[str],
    fps: dict[str, str] | None = None,
) -> None:
    n = max(1, len(buckets))
    manifest.append_manifest(
        spark,
        man_path,
        [
            {
                "stage": stage,
                "partition_key": b,
                "input_fingerprint": (fps or {}).get(b),
                "rows_in": in_counts.get(b, 0),
                "rows_out": out_counts.get(b, 0),
                "wall_ms": wall_ms // n,  # amortized: one job covered all buckets
                "status": "done",
            }
            for b in buckets
        ],
    )


def default_aliases(spark: SparkSession, gazetteer: list[str] | None = None) -> DataFrame:
    """Alias table for S2: (alias, entity_id, prior, context). In production
    this is the dictionary/gazetteer dimension (Wikidata labels etc.)."""
    gaz = gazetteer or GAZETTEER
    return spark.createDataFrame(
        [(g.lower(), g, 1.0, g) for g in gaz],
        ["alias", "entity_id", "prior", "context"],
    )


def run_web_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    aliases: DataFrame | None = None,
    n_url_buckets: int = DEFAULT_URL_BUCKETS,
    stages: tuple[str, ...] = ALL_STAGES,
) -> dict:
    """Run (or resume) the S1-S4 DAG; returns per-stage stats.

    ``stages`` restricts which stages run this invocation — the test hook
    for simulating a mid-run crash (run S1-S2, "crash", re-run all four:
    S1/S2 buckets are skipped via the manifest).
    """
    man = f"{out_dir}/manifest"
    docs_path = f"{out_dir}/docs"
    linked_path = f"{out_dir}/linked"
    entity_map_path = f"{out_dir}/entity_map"
    store_path = f"{out_dir}/triples"
    aliases = aliases if aliases is not None else default_aliases(spark)
    stats: dict[str, dict] = {}

    # ---- S1 EXTRACT: pages → docs(url, doc_id, text, lang, url_bucket) ----
    # Pending buckets are written with DYNAMIC partition overwrite, not
    # append: a crash between the parquet write and the manifest _record()
    # makes the resume re-run the same buckets, and overwrite-by-partition
    # replaces (never duplicates) their rows — S1/S2 are idempotent like S4's
    # set-merge. Lineage counts read back ONLY the just-written partitions
    # (partition pruning), so bookkeeping cost is O(delta), not O(store).
    if S1 in stages:
        t0 = time.monotonic()
        src = _bucketed(pages, "url", n_url_buckets)
        todo, pend, fps = _pending(spark, man, S1, src, fp_col="url")
        if pend:
            in_counts = _bucket_counts(todo)
            docs = todo.select(
                "url",
                F.xxhash64("url").alias("doc_id"),
                extract_text(F.col("html")).alias("text"),
                "lang",
                "url_bucket",
            )
            (
                docs.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("url_bucket")
                .parquet(docs_path)
            )
            out_counts = _bucket_counts(_read_buckets(spark, docs_path, pend))
            _record(
                spark, man, S1, in_counts, out_counts,
                int((time.monotonic() - t0) * 1000), list(in_counts), fps,
            )
        stats[S1] = {"pending_buckets": len(pend), "wall_s": round(time.monotonic() - t0, 3)}

    # ---- S2 LINK: docs → linked(doc_id, surface, entity_id, score) ----
    if S2 in stages:
        t0 = time.monotonic()
        docs = spark.read.parquet(docs_path)
        todo, pend, fps = _pending(spark, man, S2, docs, fp_col="doc_id")
        if pend:
            in_counts = _bucket_counts(todo)
            # n_docs from the lineage counts just taken — saves tfidf_weights
            # deriving N with its own aggregation over the tf exchange
            linked = link_mentions(todo, aliases, n_docs=sum(in_counts.values())).join(
                todo.select("doc_id", "url_bucket"), "doc_id"
            )
            (
                linked.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("url_bucket")
                .parquet(linked_path)
            )
            out_counts = _bucket_counts(_read_buckets(spark, linked_path, pend))
            _record(
                spark, man, S2, in_counts, out_counts,
                int((time.monotonic() - t0) * 1000), list(in_counts), fps,
            )
        stats[S2] = {"pending_buckets": len(pend), "wall_s": round(time.monotonic() - t0, 3)}

    # ---- S3 CANONICALIZE: linked surface forms → entity_map ----
    # First run: full batch canonicalization (run-once via manifest key
    # 'global'). Every run after that: an INCREMENTAL delta pass — entities
    # newly linked since the map was built (new ingest buckets) are matched
    # against the existing corpus with one cross-set LSH join and appended
    # to the map under the stability contract (existing assignments never
    # rewritten; see operators/canonicalize.py::canonicalize_entities_
    # incremental). Without this pass, S4's emap join silently dropped the
    # mentions of any entity first seen after the initial S3 run.
    if S3 in stages:
        t0 = time.monotonic()
        done = manifest.run_stage(
            spark, man, S3, "global",
            lambda: _run_canonicalize(spark, linked_path, entity_map_path),
        )
        n_delta = 0
        if done is None:  # map already exists → catch up on the delta
            n_delta = _run_canonicalize_delta(spark, linked_path, entity_map_path)
            if n_delta:
                manifest.append_manifest(
                    spark, man,
                    [{"stage": S3, "partition_key": f"delta:{n_delta}",
                      "rows_in": n_delta, "rows_out": n_delta,
                      "wall_ms": int((time.monotonic() - t0) * 1000)}],
                )
        stats[S3] = {
            "ran": done is not None,
            "delta_entities": n_delta,
            "wall_s": round(time.monotonic() - t0, 3),
        }

    # ---- S4 MATERIALIZE: triples w/ canonical IRIs → merge into store ----
    if S4 in stages:
        t0 = time.monotonic()
        docs = spark.read.parquet(docs_path)
        todo, pend, fps = _pending(spark, man, S4, docs, fp_col="doc_id")
        n_pend = len(pend)
        if n_pend:
            in_counts = _bucket_counts(todo)
            emap = spark.read.parquet(entity_map_path)
            # bucket filter prunes the linked scan to pending partitions; the
            # semi-join stays as the row-exact guard within them
            linked = _read_buckets(spark, linked_path, pend).join(
                todo.select("doc_id").distinct(), "doc_id", "left_semi"
            )
            # Stage the materialized triples to disk, not to executor memory:
            # persist()-ing an unbounded dataset OOMs the moment the batch
            # outgrows the heap (seen at 100k pages under spark-submit's
            # default driver heap) — disk staging is the only cache that
            # scales with data, and it doubles as the natural Iceberg
            # staging-table shape on a real deployment.
            import shutil

            staging = f"{out_dir}/_staging_s4"
            _materialize_triples(todo, linked, emap).write.mode("overwrite").parquet(staging)
            triples = spark.read.parquet(staging)
            # per-bucket triple counts (lineage metric): prov carries doc_id.
            # NOTE: rdf:type entity triples are minted with prov=NULL (no
            # single originating document), so per-bucket rows_out counts
            # document-attributable triples only — the store merge's return
            # value (new_triples) is the total including prov-null rows.
            prov_bucket = todo.select(
                F.col("doc_id").cast("string").alias("prov"), "url_bucket"
            ).distinct()
            out_counts = _bucket_counts(
                triples.join(prov_bucket, "prov").select("url_bucket")
            )
            n_new = kg_store.merge_triples(spark, triples, store_path)
            shutil.rmtree(staging, ignore_errors=True)
            _record(
                spark, man, S4, in_counts, out_counts,
                int((time.monotonic() - t0) * 1000), list(in_counts), fps,
            )
            stats[S4] = {
                "pending_buckets": n_pend,
                "new_triples": n_new,
                "wall_s": round(time.monotonic() - t0, 3),
            }
        else:
            stats[S4] = {"pending_buckets": 0, "new_triples": 0,
                         "wall_s": round(time.monotonic() - t0, 3)}

    return stats


def _run_canonicalize(spark: SparkSession, linked_path: str, entity_map_path: str) -> tuple[int, int]:
    ents = (
        spark.read.parquet(linked_path)
        .select(F.col("entity_id"), F.col("entity_id").alias("name"))
        .distinct()
    )
    n_in = ents.count()
    emap = canonicalize_entities(ents, id_col="entity_id", name_col="name")
    emap.write.mode("overwrite").parquet(entity_map_path)
    return n_in, spark.read.parquet(entity_map_path).count()


def _run_canonicalize_delta(spark: SparkSession, linked_path: str, entity_map_path: str) -> int:
    """Incremental S3: assign canonical ids to entities linked since the map
    was built; append-only (idempotent — the delta is an anti-join against
    the map, so a re-run after a crash mid-append just shrinks to the
    remainder). Returns the number of newly mapped entities."""
    from extremexp_knowledge_graph_spark.operators.canonicalize import (
        canonicalize_entities_incremental,
    )

    ents = (
        spark.read.parquet(linked_path)
        .select(F.col("entity_id"), F.col("entity_id").alias("name"))
        .distinct()
    )
    emap = spark.read.parquet(entity_map_path)
    new_e = ents.join(emap.select("entity_id"), "entity_id", "left_anti")
    # Stage the delta once (it feeds LSH twice + the final assign); disk
    # staging, same rationale as the S4 batch (kg_store.py merge staging).
    import shutil

    staging = entity_map_path.rstrip("/") + ".delta_staging"
    new_e.write.mode("overwrite").parquet(staging)
    new_e = spark.read.parquet(staging)
    try:
        if new_e.limit(1).count() == 0:
            return 0
        old_e = ents.join(emap.select("entity_id"), "entity_id", "left_semi")
        delta = canonicalize_entities_incremental(
            new_e, old_e, emap, id_col="entity_id", name_col="name"
        )
        delta.write.mode("append").parquet(entity_map_path)
        return spark.read.parquet(staging).count()
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _materialize_triples(docs: DataFrame, linked: DataFrame, emap: DataFrame) -> DataFrame:
    """Line/SVO pattern triples + canonical-entity mention triples."""
    pattern = line_triples(docs).unionByName(svo_triples(docs))
    canon = linked.join(emap, "entity_id").select(
        "doc_id",
        F.concat(F.lit(EX2 + "Entity_"), F.col("canonical_id")).alias("euri"),
        F.col("score"),
    )
    mention = canon.select(
        F.concat(F.lit(EX2 + "document_"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit(EX2 + "mentionsEntity").alias("pred"),
        F.col("euri").alias("obj"),
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.col("doc_id").cast("string").alias("prov"),
    ).unionByName(
        canon.select(
            F.col("euri").alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.lit(EX2 + "Entity").alias("obj"),
            F.lit(True).alias("obj_is_iri"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("prov"),
        )
    )
    return validate_triples(
        pattern.unionByName(mention).dropDuplicates(TRIPLE_KEY)
    )
