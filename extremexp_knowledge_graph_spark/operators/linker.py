"""S2 LINK — two-stage entity linker (candidate generation → scoring).

North-star shape: alias-dictionary candidate generation, then TF-IDF cosine
+ anchor-prior scoring. The scoring here is fully *relational* — TF-IDF
weights are (id, token, weight) relations and the cosine is a join-aggregate
on token — because that is the shape that actually scales on Spark: the only
wide operation is a token-keyed join that AQE can split on skew, and there
is no model state to broadcast. (A vectorized ``applyInPandas`` scorer would
move whole documents into Python for the same arithmetic.)

Alias table schema: (alias STRING, entity_id, entity_name, prior DOUBLE,
context STRING) — ``context`` is the entity's description text used for the
cosine side; ``prior`` is the anchor prior (e.g. fraction of wiki anchors
with this alias resolving to this entity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from extremexp_knowledge_graph_spark.functions.text import TOKEN_RE


def _tok(col):
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def tfidf_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df_frac: float | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(id, tok, w) with w = tf * idf, L2-normalized per id.

    idf = ln(N / (1 + df)) + 1 over the *input* corpus; tf = raw count.
    ``max_df_frac`` drops tokens appearing in more than that fraction of
    documents from the vocabulary — the boilerplate/stopword guard that
    keeps the token-keyed aggregation and the cosine join from concentrating
    on web-scale hot tokens (their idf ≈ 0 contributes ~nothing to the
    score anyway, so the cap trades negligible signal for bounded skew).

    ``n_docs``: pass N when the caller already knows it (the web pipeline's
    manifest records stage row counts) — a plain literal in the idf. When
    None, N is derived lazily as ``countDistinct(id)`` over the same tf
    exchange (ReuseExchange: no extra corpus scan, no eager driver job;
    token-less documents contribute no tf rows, no norm, and no cosine term,
    so excluding them from N only rescales idf by a corpus-quality constant).
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(_tok(F.col(text_col))).alias("tok"))
    tf = toks.groupBy("id", "tok").agg(F.count("*").cast("double").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    if n_docs is not None:
        dfreq = dfreq.withColumn("n_docs", F.lit(float(n_docs)))
    else:
        nd = tf.agg(F.countDistinct("id").cast("double").alias("n_docs"))
        dfreq = dfreq.crossJoin(F.broadcast(nd))
    if max_df_frac is not None:
        dfreq = dfreq.where(F.col("df") <= F.lit(float(max_df_frac)) * F.col("n_docs"))
    w = tf.join(dfreq, "tok").withColumn(
        "w", F.col("tf") * (F.log(F.col("n_docs") / (F.lit(1.0) + F.col("df"))) + F.lit(1.0))
    ).drop("n_docs")
    # Norms fold token-sorted, left-to-right in DOUBLE (repo convention:
    # every float reduction is order-deterministic so scores are
    # bit-reproducible across partitionings and against the DuckDB oracle's
    # ``list_reduce(list(... ORDER BY tok))``). A doc's token list is
    # bounded by its vocabulary, so the per-group array is small.
    norms = (
        w.groupBy("id")
        .agg(_sorted_fold(F.col("tok"), F.col("w") * F.col("w")).alias("norm2"))
        .select("id", F.sqrt("norm2").alias("norm"))
    )
    return (
        w.join(norms, "id")
        .select("id", "tok", (F.col("w") / F.col("norm")).alias("w"))
    )


def _sorted_fold(key, val):
    """Sum ``val`` over a group in ``key`` order, folding left-to-right in
    DOUBLE — the deterministic replacement for ``F.sum`` wherever the result
    feeds a rounded, hash-compared score."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(key.alias("k"), val.alias("v")))),
        F.lit(0.0),
        lambda acc, s: acc + s["v"],
    )


def generate_candidates(
    docs: DataFrame,
    aliases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-level alias hits: (doc_id, surface, entity_id, prior).

    The alias table is broadcast — it's the small dimension side (even a
    10M-alias gazetteer is ~GBs; for larger, drop the hint and let AQE pick).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_tok(F.col(text_col)))).alias("surface"),
    )
    al = aliases.select(F.lower(F.col("alias")).alias("surface"), "entity_id", "prior")
    return toks.join(F.broadcast(al), "surface")


def link_mentions(
    docs: DataFrame,
    aliases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.7,
    max_df_frac: float | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(doc_id, surface, entity_id, score) — argmax candidate per mention.

    score = alpha * cosine(tfidf(doc), tfidf(entity context)) +
            (1-alpha) * prior.
    Ties break on entity_id for determinism. ``max_df_frac`` caps the doc-
    side TF-IDF vocabulary by document frequency (boilerplate-token skew
    guard at web scale; see tfidf_weights).
    """
    cands = generate_candidates(docs, aliases, id_col, text_col)
    doc_w = tfidf_weights(docs, id_col, text_col, max_df_frac, n_docs).withColumnRenamed("id", "doc_id")
    ctx_w = tfidf_weights(
        aliases.select("entity_id", "context").distinct(), "entity_id", "context"
    ).withColumnRenamed("id", "entity_id")

    # cosine(doc, entity) for candidate pairs only: restrict the token join
    # to (doc, entity) pairs that are actual candidates, then sum products.
    cos = (
        cands.select("doc_id", "entity_id").distinct()
        .join(doc_w, "doc_id")
        .join(
            ctx_w.select(F.col("entity_id"), F.col("tok"), F.col("w").alias("cw")),
            ["entity_id", "tok"],
        )
        .groupBy("doc_id", "entity_id")
        # token-sorted deterministic fold (see tfidf_weights norms)
        .agg(_sorted_fold(F.col("tok"), F.col("w") * F.col("cw")).alias("cos"))
    )
    scored = (
        cands.join(cos, ["doc_id", "entity_id"], "left")
        .withColumn(
            "score",
            F.round(F.lit(alpha) * F.coalesce("cos", F.lit(0.0)) + F.lit(1 - alpha) * F.col("prior"), 6),
        )
    )
    w = Window.partitionBy("doc_id", "surface").orderBy(F.desc("score"), F.asc("entity_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("doc_id", "surface", "entity_id", "score")
    )
