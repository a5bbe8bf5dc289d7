"""Metric-value and rank literal parsing (D4/D5/D6) — Arrow-batched kernels.

The reference parses result values with *Python* ``float()`` / ``int()`` and
renders the decimal literal via Python ``str(float)`` (extremexp_kg_matic/
src/utils.py:322-340; rendering observable in data/five_papers.ttl, e.g.
``11030210.0``, ``58.1`` for input ``"58.10"``). Two reasons this cannot be a
native CAST chain:

* Java's ``Double.toString`` switches to scientific notation at 1e7
  (``1.103021E7``) where Python repr stays decimal (``11030210.0``) — a
  guaranteed lexical mismatch on the fixture corpus.
* Python ``float()``/``int()`` accept underscores, unicode digits, ``"inf"``/
  ``"nan"`` and reject ``"75.0"`` for ``int()``, none of which Spark casts
  reproduce bit-for-bit.

So these two kernels are vectorized pandas UDFs (Arrow batches, no per-row
Python interpreter round-trips through the JVM) — the pattern the web regime
uses for all Python-exact semantics. Everything around them stays native.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from extremexp_knowledge_graph_spark.schema import XSD_DECIMAL, XSD_STRING

_VALUE_RESULT_TYPE = StructType(
    [StructField("lexical", StringType()), StructField("datatype", StringType())]
)


def _parse_value_one(s: str | None) -> tuple[str | None, str | None]:
    """Exact translation of src/utils.py:322-334 (percent branch first)."""
    if not s:  # caller gates on truthiness too; belt and braces
        return None, None
    if "%" in s:
        try:
            return str(float(s.replace("%", "").strip()) / 100.0), XSD_DECIMAL
        except ValueError:
            return s, XSD_STRING
    try:
        return str(float(s)), XSD_DECIMAL
    except ValueError:
        return s, XSD_STRING


@pandas_udf(_VALUE_RESULT_TYPE)
def parse_metric_value(v: pd.Series) -> pd.DataFrame:
    parsed = [_parse_value_one(x if isinstance(x, str) else None) for x in v]
    return pd.DataFrame(parsed, columns=["lexical", "datatype"], dtype=object)


@pandas_udf(StringType())
def parse_rank(v: pd.Series) -> pd.Series:
    """``int(rank)`` with ValueError → NULL (triple dropped), per
    src/utils.py:336-340; lexical is ``str(int)``."""
    out = []
    for x in v:
        if not isinstance(x, str) or not x:
            out.append(None)
            continue
        try:
            out.append(str(int(x)))
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype=object)
