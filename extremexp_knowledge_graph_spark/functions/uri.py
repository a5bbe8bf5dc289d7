"""URI sanitization and minting — native Column expressions (D1, D7).

Replicates the reference's ``sanitize_for_uri`` (extremexp_kg_matic/
src/utils.py:14-24) and URI construction (src/utils.py:231-246, 256-257,
313-314) as Catalyst-optimizable expressions: pure string functions, no
Python on the hot path, constant-foldable when inputs are literals.

Regex fidelity notes (the hard part of D1):

* Python ``\\w``/``\\s`` are Unicode-aware; Java's are ASCII-only unless the
  pattern carries the ``(?U)`` (UNICODE_CHARACTER_CLASS) flag — the fixture
  corpus exercises this with names like ``"29 ± 3"`` and ``"D&D"``.
* Python ``str.strip()`` strips Unicode whitespace; Java ``trim()`` only
  strips <= U+0020, so stripping is done with a ``(?U)`` regex too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.schema import NS

#: Python ``re.sub(r'[^\w\s-]', '')`` equivalent (src/utils.py:22).
_STRIP_SPECIAL = r"(?U)[^\w\s-]"
#: Python ``re.sub(r'[-\s]+', '_')`` equivalent (src/utils.py:23).
_COLLAPSE = r"(?U)[-\s]+"
_TRIM = r"(?U)^\s+|\s+$"


def sanitize_for_uri(text: Column) -> Column:
    """Column translation of ``sanitize_for_uri`` (src/utils.py:14-24).

    NULL/empty input → ``"unknown"``; input reduced to nothing by the
    character filter → ``"sanitized_empty"``.
    """
    stripped = F.regexp_replace(text, _TRIM, "")
    cleaned = F.regexp_replace(
        F.regexp_replace(stripped, _STRIP_SPECIAL, ""), _COLLAPSE, "_"
    )
    return (
        F.when(text.isNull() | (text == F.lit("")), F.lit("unknown"))
        .when(cleaned == F.lit(""), F.lit("sanitized_empty"))
        .otherwise(cleaned)
    )


def paper_uri(title: Column) -> Column:
    """Paper subject IRI (src/utils.py:255-257).

    Missing title defaults to the *unsanitized* string ``"Unknown"`` before
    sanitization (``paper_data.get("title", "Unknown")``), whereas an empty
    title hits the sanitizer's falsy branch and becomes ``"unknown"`` —
    a reference quirk we reproduce deliberately.
    """
    return F.concat(F.lit(NS + "Paper_"), sanitize_for_uri(F.coalesce(title, F.lit("Unknown"))))


def entity_uri(class_name: str, name: Column) -> Column:
    """Entity IRI ``<NS><Class>_<sanitized-name>`` (src/utils.py:231-246).

    The reference memoizes this in ``uri_cache``; since minting is a pure
    deterministic function of (class, name), no state is needed — identical
    names converge to identical IRIs in any partition of any executor.
    """
    return F.concat(F.lit(NS + class_name + "_"), sanitize_for_uri(name))


def result_uri(paper_san: Column, idx: Column) -> Column:
    """ReportedResult IRI ``<NS><sanitized-title>_result_<idx>`` — note: NO
    class prefix, and the list position is part of the identity
    (src/utils.py:312-314); callers must use ``posexplode``.
    """
    return F.concat(F.lit(NS), paper_san, F.lit("_result_"), idx.cast("string"))
