"""arXiv-aware publication-year extraction from PDF URLs (D3).

Column translation of ``get_year_from_pdf_url`` (extremexp_kg_matic/
src/utils.py:165-207):

1. arXiv IDs ``arxiv.org/pdf/YYMM.NNNNN`` (case-insensitive): YY>=90 → 19YY
   else 20YY, with the month validated to 01-12; an invalid month falls
   through to the generic rule (src/utils.py:186-197).
2. Fallback: the *last* standalone 4-digit year 1900-2099 anywhere in the
   URL (src/utils.py:199-205).

Returns a STRING year (the reference builds the gYear literal from the
string) or NULL. Pure expression — constant-foldable, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ARXIV = r"(?i)arxiv\.org/pdf/(\d{2})(\d{2})\.\d+"
_YEAR_FALLBACK = r"\b(19\d{2}|20\d{2})\b"


def year_from_pdf_url(url: Column) -> Column:
    yy = F.regexp_extract(url, _ARXIV, 1)
    mm = F.regexp_extract(url, _ARXIV, 2)
    yy_i = yy.try_cast("int")
    mm_i = mm.try_cast("int")
    arxiv_valid = (yy != F.lit("")) & mm_i.between(1, 12)
    arxiv_year = (
        F.when(yy_i >= 90, yy_i + F.lit(1900)).otherwise(yy_i + F.lit(2000)).cast("string")
    )
    # Last 4-digit year in the URL; try_element_at → NULL on empty match list.
    fallback = F.try_element_at(F.regexp_extract_all(url, F.lit(_YEAR_FALLBACK), 1), F.lit(-1))
    return F.when(url.isNull() | (url == F.lit("")), F.lit(None).cast("string")).otherwise(
        F.when(arxiv_valid, arxiv_year).otherwise(fallback)
    )
