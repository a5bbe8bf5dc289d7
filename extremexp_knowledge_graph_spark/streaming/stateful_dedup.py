"""Custom stateful streaming operator: cross-batch exact deduplication.

The streaming form of ``operators/dedup.py::exact_dedup``: documents arrive
in micro-batches, and only the FIRST document ever seen with a given
content fingerprint survives — across batches and restarts, not just within
one batch (Spark's own ``dropDuplicates`` on a stream needs the whole key
history in state too; doing it via ``applyInPandasWithState`` makes the
state explicit, minimal — one boolean per fingerprint — and gives us the
keeper-id tie-break the batch operator guarantees).

This is the "custom stateful operator" pattern the engine uses wherever
built-in streaming ops can't express the semantics: group by key →
Arrow-batched function with explicit per-key state → append-mode output.
State size is O(distinct fingerprints), the irreducible minimum for exact
streaming dedup; at 100 TB you bound it with a TTL (GroupStateTimeout) and
accept re-admitting a dup after the window — the standard trade.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

SURVIVOR_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit the min-doc_id row of this fingerprint group iff the fingerprint
    has never been seen in any earlier batch; then mark it seen forever."""
    if state.exists:
        return iter(())
    best = None
    for pdf in pdfs:
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if best is None or cand["doc_id"] < best["doc_id"]:
            best = cand
    state.update((True,))
    if best is None:
        return iter(())
    out = pd.DataFrame(
        [{"fingerprint": key[0], "doc_id": int(best["doc_id"]), "text": best["text"]}]
    )
    return iter([out])


def fingerprinted(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint column (same normalization as batch exact dedup)."""
    return docs.withColumn(
        "fingerprint", F.md5(F.regexp_replace(F.col(text_col), r"\s+", " "))
    )


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 16,
):
    """File-source document stream → stateful cross-batch exact dedup →
    parquet of survivors. Returns the StreamingQuery."""
    raw = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    survivors = (
        fingerprinted(raw)
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=SURVIVOR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        survivors.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
