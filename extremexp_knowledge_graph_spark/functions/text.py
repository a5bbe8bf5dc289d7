"""Text-analysis kernels for the training-data pipeline — all native
expressions (whole-stage-codegen'd; zero Python), each designed to be
reproducible in plain SQL so the DuckDB oracle can recompute them.

token_count     whitespace-robust alnum tokenization
quality_score   length/punctuation/stopword-ratio composite
lang_id         marker-stopword n-gram heuristic over a fixed language table
fingerprint     whitespace-normalized md5 (exact-dedup key; rolling/simhash
                fingerprints live in operators/dedup.py)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

#: marker stopwords per language — deterministic, tiny, broadcastable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "die", "und", "nicht", "das"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}
#: fixed precedence for argmax ties (deterministic, documented)
LANG_ORDER = ["en", "de", "es", "fr"]

STOPWORDS = ["the", "a", "and", "is", "of", "to", "in", "it", "that", "for"]


#: GPT-2-style pre-tokenizer pattern, restricted to constructs both Java
#: regex and RE2 (DuckDB) support (no lookahead): contractions, space-glued
#: letter runs, digit runs, punctuation runs, whitespace runs. Counting
#: these pieces approximates BPE token counts well enough for length
#: filtering/budgeting without a merges table.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate BPE token count: pieces matched by the GPT-2-style
    pre-tokenizer regex, minus pure-whitespace pieces (they merge into the
    following token in real BPE). Whitespace-split word count is the other
    bound; both are cheap native expressions."""
    pieces = F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0)
    return F.size(F.filter(pieces, lambda p: ~p.rlike(r"^\s+$"))).cast("long")


def whitespace_token_count(text: Column) -> Column:
    """Plain whitespace-split token count (empty/blank → 0)."""
    return F.size(
        F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    ).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_count(text: Column) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(stop_arr, t))).cast("long")


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("long")


def quality_score(text: Column) -> Column:
    """Composite in [0,1]: favors mid-length docs with sane punctuation and
    moderate stopword ratio. Pure arithmetic — identical in any SQL engine:

        0.5 * min(1, n_tokens/100)
      + 0.3 * (1 - min(1, punct/ max(tokens,1)))
      + 0.2 * min(1, 4 * stopwords / max(tokens, 1))
    """
    nt = token_count(text).cast("double")
    sw = stopword_count(text).cast("double")
    pc = punct_count(text).cast("double")
    nt1 = F.greatest(nt, F.lit(1.0))
    return F.round(
        F.least(nt / 100.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.least(pc / nt1, F.lit(1.0))) * 0.3
        + F.least(sw * 4.0 / nt1, F.lit(1.0)) * 0.2,
        6,
    )


def lang_marker_count(text: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(markers, t))).cast("long")


def lang_id(text: Column) -> Column:
    """Argmax of marker counts with fixed precedence; 'und' when all zero.

    Heuristic n-gram language ID in its simplest deterministic form —
    the shape of a real fastText-style classifier with the model swapped
    for a marker table (classifier weights aren't in this container).
    """
    counts = [(lang, lang_marker_count(text, lang)) for lang in LANG_ORDER]
    best = F.greatest(*[c for _, c in counts])
    expr = F.lit("und")
    for lang, c in reversed(counts):  # reversed → earlier langs win ties
        expr = F.when((best > 0) & (c == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))
