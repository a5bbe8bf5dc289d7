"""Sliding-window document chunking — the tokenize→window→stride step every
LLM training-data pipeline runs before packing sequences.

The reference has no analogue (its documents are consumed whole,
``extremexp_kg_matic/src/utils.py:249-362`` iterates papers as units); this
is a training-data extension in the same family as dedup/sampling. The
whole operator is native Spark expressions — ``regexp_extract_all`` →
``sequence``/``posexplode`` → ``slice``/``array_join`` — so chunking
100 TB of text stays inside whole-stage codegen with zero Python: the
per-row fan-out is the narrow transform Spark parallelizes for free, no
shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the repo-wide tokenizer — imported, not re-declared, so chunk boundaries
# can never silently diverge from linker/text tokenization
from extremexp_knowledge_graph_spark.functions.text import TOKEN_RE


def chunk_documents(
    docs: DataFrame,
    window: int = 40,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows of ``window`` tokens starting
    every ``stride`` tokens (overlapping when stride < window — the
    standard packing shape). Output one row per chunk:
    (id, chunk_idx, start_tok, n_tokens, chunk_text); the final chunk may
    be short; empty documents yield no chunks. All positions/counts are
    exact ints so an external engine replays the windows verbatim."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    d = (
        docs.select(F.col(id_col), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .where(F.col("n") > 0)
    )
    d = d.select(
        id_col,
        "toks",
        F.posexplode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias(
            "chunk_idx", "start_tok"
        ),
    )
    chunk = F.slice("toks", F.col("start_tok") + 1, window)
    return d.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
