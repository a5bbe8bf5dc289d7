"""extremexp_knowledge_graph_spark — PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-implementation of the capabilities of
MuteMuty/ExtremeXP_knowledge_graph (reference snapshot at /root/reference/):
an extract → link → canonicalize → materialize pipeline that turns

  * structured paper metadata (JSON arrays, the reference's fixture regime), and
  * Common-Crawl-style web pages `(url, warc_ts, html, text, lang)` (web regime)

into a partitioned `(subj, pred, obj, obj_is_iri, obj_datatype, prov)` triple
table, matching the reference's emitted triples exactly on its fixture corpus
(reference mapper: extremexp_kg_matic/src/utils.py:209-365), while replacing
its single-threaded rdflib/Fuseki architecture with declarative DataFrame
plans that Catalyst/AQE can optimize and that scale horizontally.

Layout
------
schema.py      input/output schemas + the fixed ontology (src/kg_schema.py)
session.py     SparkSession builder with scale-oriented defaults
functions/     scalar kernels (URI sanitize, year extraction, literal parsing,
               text quality/langid/fingerprint) — native Column expressions
               where possible, Arrow-batched pandas UDFs where Python-exact
               semantics are required
operators/     dataflow operators: papers→triples mapper, pattern/gazetteer
               extraction, HTML text extraction, entity linker, LSH blocking +
               connected-components canonicalization, dedup family, ANN
               similarity, multimodal plumbing
sources/       batch readers + deterministic synthetic `pages` generator
plans/         triple-store materialization (dedup/merge), checkpoint manifest
               with resume, query-side plans over the triple table
streaming/     Structured Streaming ingestion (file watcher replacement)
"""

__version__ = "0.1.0"

NAMESPACE = "http://extremexp.eu/ontology/matic_papers/"
