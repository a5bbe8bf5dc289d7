"""Papers → triples mapper: the fixture-regime materialization stage.

Declarative re-expression of the reference's row-at-a-time rdflib mapper
``create_rdf_graph_from_papers`` (extremexp_kg_matic/src/utils.py:209-365) as
a union of narrow column-pruned projections — one per predicate family — each
of which Catalyst can prune/push down independently, followed by a single
hash-aggregate dedup (the Spark equivalent of rdflib's set semantics +
``KGService._remove_duplicates``, src/kg_service.py:235-249).

Faithfulness notes (each is observable in data/five_papers.ttl):

* Python truthiness gates every property emission (src/utils.py:261-276,
  319-336): empty strings AND ``year == 0`` emit nothing.
* Result URIs embed the list position (src/utils.py:312-314) → posexplode.
* Entity-name literals are **typed** xsd:string when emitted from the
  paper-level mention lists (src/utils.py:285,295,305) but **untyped** plain
  literals when emitted inside the results loop (src/utils.py:346,353) —
  rdflib treats those as distinct triples and so do we (obj_datatype NULL).
* The ``mentions`` input field is accepted but never mapped (dead field,
  src/api.py:121-122) — we likewise ignore it.

Scale design: each branch reads only the columns it needs (parquet column
pruning), explodes locally (no shuffle), and the only shuffle in the whole
stage is the final dedup exchange on the triple key — partial (map-side)
aggregation collapses the heavy intra-paper duplication (hot entities like
``Method_Adam`` recur across results) before anything crosses the network.
Hot-subject skew at write time is handled downstream by the store layer
(plans/kg_store.py) via salted bucketing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.functions.uri import (
    entity_uri,
    result_uri,
    sanitize_for_uri,
)
from extremexp_knowledge_graph_spark.functions.values import parse_metric_value, parse_rank
from extremexp_knowledge_graph_spark.functions.year import year_from_pdf_url
from extremexp_knowledge_graph_spark.schema import (
    CLS_DATASET,
    CLS_METHOD,
    CLS_MODEL_CONFIGURATION,
    CLS_PAPER,
    CLS_REPORTED_RESULT,
    CLS_TASK,
    NS,
    P_ACHIEVED_BY_MODEL,
    P_CONFIGURATION_STRING,
    P_DATASET_NAME,
    P_EMPLOYS_METHOD,
    P_EVALUATES_TASK,
    P_MENTIONS_DATASET,
    P_MENTIONS_TASK,
    P_METHOD_NAME,
    P_METRIC_NAME,
    P_METRIC_VALUE,
    P_ON_DATASET,
    P_PDF_URL,
    P_PWC_URL,
    P_RANK,
    P_REPORTED_IN_PAPER,
    P_REPORTS_RESULT,
    P_TASK_NAME,
    P_TITLE,
    P_YEAR,
    RDF_TYPE,
    TRIPLE_KEY,
    XSD_ANYURI,
    XSD_GYEAR,
    XSD_INTEGER,
    XSD_STRING,
)

def _null_s() -> Column:
    # built lazily: F.lit requires an active SparkContext, and the module must
    # stay importable before any session exists (library surface)
    return F.lit(None).cast("string")


def _truthy(c: Column) -> Column:
    """Python ``if value:`` on a string column."""
    return c.isNotNull() & (c != F.lit(""))


def _t(s: Column, p: str, o: Column, is_iri: bool, dt: str | None, prov: Column) -> Column:
    return F.struct(
        s.alias("subj"),
        F.lit(p).alias("pred"),
        o.alias("obj"),
        F.lit(is_iri).alias("obj_is_iri"),
        (F.lit(dt) if dt is not None else _null_s()).alias("obj_datatype"),
        prov.alias("prov"),
    )


def _explode_triples(df: DataFrame, entries: list[Column]) -> DataFrame:
    """Pack conditional triple structs into an array, drop the NULL slots of
    un-taken branches, explode back to rows — one pass, zero shuffles."""
    return df.select(
        F.explode(F.array_compact(F.array(*entries))).alias("t")
    ).select("t.*")


def _with_prov(df: DataFrame) -> DataFrame:
    return df if "prov" in df.columns else df.withColumn("prov", _null_s())


def _paper_scalars(df: DataFrame) -> DataFrame:
    """Paper-level datatype properties (src/utils.py:254-276)."""
    base = df.select(
        F.col("title"),
        F.col("year"),
        F.col("url"),
        F.col("origin"),
        F.col("prov"),
    ).withColumn("subj", F.concat(F.lit(NS + "Paper_"), sanitize_for_uri(F.coalesce("title", F.lit("Unknown")))))
    url_year = year_from_pdf_url(F.col("url"))
    prov = F.col("prov")
    s = F.col("subj")
    entries = [
        _t(s, RDF_TYPE, F.lit(CLS_PAPER), True, None, prov),
        F.when(_truthy(F.col("title")), _t(s, P_TITLE, F.col("title"), False, XSD_STRING, prov)),
        F.when(_truthy(F.col("url")), _t(s, P_PDF_URL, F.col("url"), False, XSD_ANYURI, prov)),
        F.when(
            _truthy(F.col("url")) & url_year.isNotNull(),
            _t(s, P_YEAR, url_year, False, XSD_GYEAR, prov),
        ),
        F.when(
            F.col("year").isNotNull() & (F.col("year") != F.lit(0)),
            _t(s, P_YEAR, F.col("year").cast("string"), False, XSD_GYEAR, prov),
        ),
        F.when(_truthy(F.col("origin")), _t(s, P_PWC_URL, F.col("origin"), False, XSD_ANYURI, prov)),
    ]
    return _explode_triples(base, entries)


def _mentions(df: DataFrame, list_col: str, cls_name: str, cls_iri: str, name_pred: str, link_pred: str) -> DataFrame:
    """Paper-level mention lists → (type, name, link) triple triplets
    (src/utils.py:278-306). Name literals are typed xsd:string here."""
    base = df.select(
        F.concat(F.lit(NS + "Paper_"), sanitize_for_uri(F.coalesce("title", F.lit("Unknown")))).alias("subj"),
        F.explode(list_col).alias("name"),
        F.col("prov"),
    )
    euri = entity_uri(cls_name, F.col("name"))
    prov = F.col("prov")
    entries = [
        _t(euri, RDF_TYPE, F.lit(cls_iri), True, None, prov),
        _t(euri, name_pred, F.col("name"), False, XSD_STRING, prov),
        _t(F.col("subj"), link_pred, euri, True, None, prov),
    ]
    return _explode_triples(base, entries)


def _results(df: DataFrame) -> DataFrame:
    """Positional results explode + per-result fan-out (src/utils.py:308-362)."""
    base = df.select(
        sanitize_for_uri(F.coalesce("title", F.lit("Unknown"))).alias("paper_san"),
        F.posexplode("results").alias("idx", "r"),
        F.col("prov"),
    )
    base = base.select(
        F.concat(F.lit(NS + "Paper_"), F.col("paper_san")).alias("subj"),
        result_uri(F.col("paper_san"), F.col("idx")).alias("ruri"),
        F.col("r.*"),
        F.col("prov"),
    )
    # Arrow-batched Python-exact literal kernels, gated on truthiness so the
    # kernels only see values that will actually emit triples.
    base = base.withColumn(
        "val_parsed", F.when(_truthy(F.col("value")), parse_metric_value(F.col("value")))
    ).withColumn("rank_lex", F.when(_truthy(F.col("rank")), parse_rank(F.col("rank"))))

    s, r, prov = F.col("subj"), F.col("ruri"), F.col("prov")
    task_uri = entity_uri("Task", F.col("task"))
    ds_uri = entity_uri("Dataset", F.col("dataset"))
    mc_uri = entity_uri("ModelConfiguration", F.col("model"))
    entries = [
        _t(r, RDF_TYPE, F.lit(CLS_REPORTED_RESULT), True, None, prov),
        _t(s, P_REPORTS_RESULT, r, True, None, prov),
        _t(r, P_REPORTED_IN_PAPER, s, True, None, prov),
        F.when(_truthy(F.col("metric")), _t(r, P_METRIC_NAME, F.col("metric"), False, XSD_STRING, prov)),
        F.when(
            F.col("val_parsed").isNotNull(),
            F.struct(
                r.alias("subj"),
                F.lit(P_METRIC_VALUE).alias("pred"),
                F.col("val_parsed.lexical").alias("obj"),
                F.lit(False).alias("obj_is_iri"),
                F.col("val_parsed.datatype").alias("obj_datatype"),
                prov.alias("prov"),
            ),
        ),
        F.when(F.col("rank_lex").isNotNull(), _t(r, P_RANK, F.col("rank_lex"), False, XSD_INTEGER, prov)),
        # Result-level entities: UNTYPED name literals (src/utils.py:346,353)
        # except ModelConfiguration, typed xsd:string (src/utils.py:361).
        F.when(_truthy(F.col("task")), _t(task_uri, RDF_TYPE, F.lit(CLS_TASK), True, None, prov)),
        F.when(_truthy(F.col("task")), _t(task_uri, P_TASK_NAME, F.col("task"), False, None, prov)),
        F.when(_truthy(F.col("task")), _t(r, P_EVALUATES_TASK, task_uri, True, None, prov)),
        F.when(_truthy(F.col("dataset")), _t(ds_uri, RDF_TYPE, F.lit(CLS_DATASET), True, None, prov)),
        F.when(_truthy(F.col("dataset")), _t(ds_uri, P_DATASET_NAME, F.col("dataset"), False, None, prov)),
        F.when(_truthy(F.col("dataset")), _t(r, P_ON_DATASET, ds_uri, True, None, prov)),
        F.when(_truthy(F.col("model")), _t(mc_uri, RDF_TYPE, F.lit(CLS_MODEL_CONFIGURATION), True, None, prov)),
        F.when(_truthy(F.col("model")), _t(mc_uri, P_CONFIGURATION_STRING, F.col("model"), False, XSD_STRING, prov)),
        F.when(_truthy(F.col("model")), _t(r, P_ACHIEVED_BY_MODEL, mc_uri, True, None, prov)),
    ]
    return _explode_triples(base, entries)


def validate_triples(triples: DataFrame, strict: bool = False) -> DataFrame:
    """B4 (+ optional B5) triple validity filters.

    B4 — drop triples with NULL/empty subject or predicate, the Spark form
    of ``KGService._validate_graph`` (src/kg_service.py:213-233).
    B5 (``strict=True``) — the char-level gate of ``validate_triple``
    (src/utils.py:116-142): min length 2 and none of ``< > " \\ \\n \\r \\t``
    in s/p/o. The reference defines but never calls it on the main path, so
    it is opt-in here too (it would reject legitimate literals).
    """
    out = triples.where(
        F.col("subj").isNotNull()
        & (F.col("subj") != "")
        & F.col("pred").isNotNull()
        & (F.col("pred") != "")
    )
    if strict:
        bad = r'[<>"\\\n\r\t]'
        for c in ["subj", "pred", "obj"]:
            out = out.where(
                (F.length(c) >= 2) & ~F.col(c).rlike(bad)
            )
    return out


def papers_to_triples(papers: DataFrame, dedup: bool = True) -> DataFrame:
    """Map a normalized papers DataFrame (schema.PAPER_SCHEMA) to the triple
    table (schema.TRIPLE_SCHEMA).

    ``dedup=True`` applies set semantics over the whole input batch, exactly
    like one rdflib Graph built from the full papers list (src/utils.py:229 +
    src/kg_service.py:235-249). Dedup ignores ``prov`` (any witness wins).
    """
    papers = _with_prov(papers)
    # B2: non-dict rows can't exist under an explicit schema; the closest
    # Spark analogue of "skip garbage" is dropping all-null rows.
    branches = [
        _paper_scalars(papers),
        _mentions(papers, "tasks", "Task", CLS_TASK, P_TASK_NAME, P_MENTIONS_TASK),
        _mentions(papers, "datasets", "Dataset", CLS_DATASET, P_DATASET_NAME, P_MENTIONS_DATASET),
        _mentions(papers, "methods", "Method", CLS_METHOD, P_METHOD_NAME, P_EMPLOYS_METHOD),
        _results(papers),
    ]
    triples = reduce(DataFrame.unionByName, branches)
    if dedup:
        triples = triples.dropDuplicates(TRIPLE_KEY)
    return triples
