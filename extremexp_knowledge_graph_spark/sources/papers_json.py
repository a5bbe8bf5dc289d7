"""Paper-metadata JSON sources (A1-A4).

The reference ingests the same JSON-array-of-papers shape through four doors
(one-shot file load extremexp_kg_matic/src/main.py:180-187; watched file
src/file_watcher.py:92-104; HTTP body src/api.py:224-234; multipart upload
src/api.py:287-330). All of them collapse to one Spark reader: an
explicit-schema multiLine JSON scan. PERMISSIVE mode plus a corrupt-record
column replaces the reference's retry-then-quarantine loop
(src/file_watcher.py:86-202) — poisoned files become quarantine rows, not
exceptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from extremexp_knowledge_graph_spark.schema import PAPER_RAW_SCHEMA

CORRUPT_COL = "_corrupt_record"


def read_papers_json(spark: SparkSession, path: str, with_corrupt: bool = False) -> DataFrame:
    """Read a JSON array (or newline JSON) of paper objects with the explicit
    PaperData schema (src/api.py:114-127). Single objects parse fine too —
    Spark's multiLine reader auto-wraps, like src/api.py:329-330.
    """
    schema = PAPER_RAW_SCHEMA
    if with_corrupt:
        schema = StructType(list(PAPER_RAW_SCHEMA.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return normalize_aliases(df.withColumn("prov", F.input_file_name()))


def ingest_upload(
    spark: SparkSession, payload: bytes, upload_dir: str, name: str = "upload.json", with_corrupt: bool = False
) -> DataFrame:
    """A4 multipart-upload source (src/api.py:287-330): the uploaded bytes
    are persisted under ``upload_dir`` (the reference saves to its data dir
    before processing, src/api.py:302-310) and then read through the same
    schema-enforced scan as every other door — single objects auto-wrap,
    corrupt payloads become quarantine rows when ``with_corrupt`` is set,
    exactly as A1/A2."""
    import os

    os.makedirs(upload_dir, exist_ok=True)
    target = os.path.join(upload_dir, name)
    with open(target, "wb") as f:
        f.write(payload)
    return read_papers_json(spark, target, with_corrupt=with_corrupt)


def normalize_aliases(df: DataFrame) -> DataFrame:
    """Alias normalization (B1): ``pdfUrl``→``url``, ``papersWithCodeUrl``→
    ``origin`` (src/api.py:236-248; the mapper's own coalesce at
    src/utils.py:264-265,274-275 makes one-way coalesce sufficient)."""
    cols = set(df.columns)
    out = df
    if "pdfUrl" in cols:
        out = out.withColumn("url", F.coalesce("url", "pdfUrl") if "url" in cols else F.col("pdfUrl")).drop("pdfUrl")
    if "papersWithCodeUrl" in cols:
        out = out.withColumn(
            "origin", F.coalesce("origin", "papersWithCodeUrl") if "origin" in cols else F.col("papersWithCodeUrl")
        ).drop("papersWithCodeUrl")
    return out
