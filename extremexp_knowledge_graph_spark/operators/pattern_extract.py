"""Text-pattern triple extraction (F1/F2 generalized) — fully native plans.

Spark-scale re-expression of the reference's unstructured-text extractor
``create_rdf_graph_from_text`` (extremexp_kg_matic/src/utils.py:26-114):

* F1 — document/line decomposition (src/utils.py:44-65): document node with
  ``hasContent``, one ``Line`` node per non-blank line with 1-based position.
  Deliberate deviation: the reference mints *global* ``line_<i>`` URIs that
  collide across documents (src/utils.py:61) — at web scale that merges every
  document's graph, so our line/relationship URIs are document-scoped.
* F2 — SVO relation extraction (src/utils.py:67-106): six patterns
  ``(\\w+)\\s+<verb>\\s+(\\w+)`` (case-insensitive), applied independently
  (matches consumed by one pattern are still visible to the others —
  semantics of six separate ``re.findall`` passes), subject/object
  lowercased, ``is`` mapped to ``rdf:type``, plus a reified Relationship
  node (type/hasSubject/hasObject/foundInLine).
* Gazetteer mentions — the seed of the web regime's entity-linking stage
  (SURVEY.md §7 S2): token-level match of document text against a broadcast
  entity dictionary.

Everything here is built-in expressions (split/posexplode/
regexp_extract_all/arrays_zip/explode) — zero Python in the hot path; the
whole plan stays inside WholeStageCodegen until the final union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.schema import EX2, RDFS_NS, RDF_TYPE

RDFS_LABEL = RDFS_NS + "label"
SVO_VERBS = ["is", "has", "contains", "includes", "uses", "implements"]

_TRIM = r"(?U)^\s+|\s+$"


def _t(s: Column, p, o: Column, is_iri: bool, prov: Column, dt: str | None = None) -> Column:
    return F.struct(
        s.alias("subj"),
        (p if isinstance(p, Column) else F.lit(p)).alias("pred"),
        o.alias("obj"),
        F.lit(is_iri).alias("obj_is_iri"),
        (F.lit(dt) if dt else F.lit(None).cast("string")).alias("obj_datatype"),
        prov.alias("prov"),
    )


def _emit(df: DataFrame, entries: list[Column]) -> DataFrame:
    return df.select(F.explode(F.array_compact(F.array(*entries))).alias("t")).select("t.*")


def _doc_uri(id_col: Column) -> Column:
    return F.concat(F.lit(EX2 + "document_"), id_col.cast("string"))


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, line_no[1-based], line[stripped non-blank]) — F1 explode."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_raw"),
        )
        .withColumn("line", F.regexp_replace("_raw", _TRIM, ""))
        .where(F.col("line") != "")
        .select(
            F.col("_id"),
            (F.col("_pos") + F.lit(1)).alias("line_no"),
            F.col("line"),
        )
    )


def line_triples(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """F1: document + line decomposition triples (src/utils.py:44-65)."""
    prov = F.col(id_col).cast("string")
    doc = df.select(F.col(id_col), F.col(text_col))
    d = _doc_uri(F.col(id_col))
    doc_branch = _emit(
        doc,
        [
            _t(d, RDF_TYPE, F.lit(EX2 + "Document"), True, prov),
            _t(d, RDFS_LABEL, F.col(id_col).cast("string"), False, prov),
            _t(d, EX2 + "hasContent", F.col(text_col), False, prov),
        ],
    )
    lines = _lines(df, id_col, text_col)
    luri = F.concat(
        F.lit(EX2 + "document_"), F.col("_id").cast("string"), F.lit("_line_"), F.col("line_no")
    )
    lprov = F.col("_id").cast("string")
    line_branch = _emit(
        lines,
        [
            _t(luri, RDF_TYPE, F.lit(EX2 + "Line"), True, lprov),
            _t(luri, RDFS_LABEL, F.concat(F.lit("Line "), F.col("line_no")), False, lprov),
            _t(luri, EX2 + "hasText", F.col("line"), False, lprov),
            _t(_doc_uri(F.col("_id")), EX2 + "hasLine", luri, True, lprov),
        ],
    )
    return doc_branch.unionByName(line_branch)


def svo_matches(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All SVO pattern matches: (doc_id, line_no, verb, subj_tok, obj_tok).

    Six independent extraction passes, exactly like the reference's six
    ``re.findall`` loops (src/utils.py:69-99); tokens lowercased
    (src/utils.py:81-82).
    """
    lines = _lines(df, id_col, text_col)
    # Single-pass plan: all six extraction passes evaluate against one scan
    # of the exploded lines (a 6-way unionByName would rescan the input six
    # times); the per-verb match arrays are tagged, flattened, and exploded
    # once. Still zero Python — regexp_extract_all + higher-order functions.
    per_verb = []
    for verb in SVO_VERBS:
        pat = rf"(?iU)(\w+)\s+{verb}\s+(\w+)"
        subj_arr = F.regexp_extract_all(F.col("line"), F.lit(pat), 1)
        obj_arr = F.regexp_extract_all(F.col("line"), F.lit(pat), 2)
        per_verb.append(
            F.transform(
                F.arrays_zip(subj_arr.alias("s"), obj_arr.alias("o")),
                lambda m: F.struct(
                    F.lit(verb).alias("verb"),
                    F.lower(m["s"]).alias("subj_tok"),
                    F.lower(m["o"]).alias("obj_tok"),
                ),
            )
        )
    return lines.select(
        F.col("_id").alias("doc_id"),
        F.col("line_no"),
        F.explode(F.flatten(F.array(*per_verb))).alias("m"),
    ).select("doc_id", "line_no", "m.verb", "m.subj_tok", "m.obj_tok")


def svo_triples(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """F2: relation triple + reified Relationship per match (src/utils.py:84-106)."""
    m = svo_matches(df, id_col, text_col)
    prov = F.col("doc_id").cast("string")
    s_uri = F.concat(F.lit(EX2), F.col("subj_tok"))
    o_uri = F.concat(F.lit(EX2), F.col("obj_tok"))
    # 'is' → rdf:type (src/utils.py:88-89); other verbs → EX2 predicate
    rel_pred = F.when(F.col("verb") == "is", F.lit(RDF_TYPE)).otherwise(
        F.concat(F.lit(EX2), F.col("verb"))
    )
    rel_uri = F.concat(
        F.lit(EX2 + "document_"),
        F.col("doc_id").cast("string"),
        F.lit("_relationship_"),
        F.col("subj_tok"),
        F.lit("_"),
        F.col("obj_tok"),
        F.lit("_"),
        F.col("line_no"),
    )
    line_uri = F.concat(
        F.lit(EX2 + "document_"), F.col("doc_id").cast("string"), F.lit("_line_"), F.col("line_no")
    )
    return _emit(
        m,
        [
            _t(s_uri, rel_pred, o_uri, True, prov),
            _t(rel_uri, RDF_TYPE, F.lit(EX2 + "Relationship"), True, prov),
            _t(rel_uri, EX2 + "hasSubject", s_uri, True, prov),
            _t(rel_uri, EX2 + "hasObject", o_uri, True, prov),
            _t(rel_uri, EX2 + "foundInLine", line_uri, True, prov),
        ],
    )


def gazetteer_mentions(
    df: DataFrame,
    gazetteer: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-level dictionary mention extraction (S2 candidate generation).

    Tokenizes the text, lowercases, and broadcast-joins against the entity
    dictionary — the scalable replacement for per-row ``in`` scans. Emits one
    ``(document, mentions, Term)`` triple per distinct (doc, entity) pair.
    """
    spark = df.sparkSession
    gaz = spark.createDataFrame(
        [(g.lower(), g) for g in gazetteer], ["tok", "entity"]
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"(?U)\w+"), 0))).alias("tok"),
    )
    hits = toks.join(F.broadcast(gaz), "tok").select("doc_id", "entity").distinct()
    prov = F.col("doc_id").cast("string")
    return _emit(
        hits,
        [
            _t(
                _doc_uri(F.col("doc_id")),
                EX2 + "mentions",
                F.concat(F.lit(EX2 + "Term_"), F.col("entity")),
                True,
                prov,
            )
        ],
    )
