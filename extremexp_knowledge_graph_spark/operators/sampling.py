"""Deterministic sampling for training-data curation.

``DataFrame.sample()`` draws per-partition pseudo-random rows: membership
changes with partitioning, rerun, and engine — useless for reproducible
train subsets or resumable pipelines. These operators make membership a
PURE FUNCTION of a key column: a row is kept iff the first 8 hex chars of
``md5(key || '|' || salt)`` compare below a threshold derived from the
requested fraction. Lowercase-hex string comparison IS numeric comparison,
so the predicate is exact, shuffle-free, join-free, pushes down past any
layout, and reproduces bit-for-bit in any engine with md5 (the DuckDB
driver oracle runs the same predicate verbatim).

The reference has no sampling surface (it ingests everything,
extremexp_kg_matic/src/file_watcher.py:204-329); this is part of the
training-data extension family (SURVEY.md §6) — at 10^12 documents every
curation pipeline starts with a deterministic subsample, and per-stratum
fractions (e.g. per-language) are how corpus balance is engineered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-prefix space: 16^8 buckets — fraction resolution 1/4.3e9, far below
#: any curation tolerance
_SPACE = 16**8


def frac_to_hex_threshold(frac: float) -> str:
    """Map a fraction in [0, 1] to the 8-hex-char threshold string such
    that P[md5_prefix < threshold] == round(frac * 16^8) / 16^8."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {frac}")
    return format(min(int(round(frac * _SPACE)), _SPACE - 1), "08x") if frac < 1.0 else "g" * 8


def sample_hash_col(key: Column, salt: str) -> Column:
    """The uniform-hash column: first 8 hex chars of md5(key || '|' || salt)."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"|{salt}"))), 1, 8)


def deterministic_sample(
    df: DataFrame, frac: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``frac`` subset keyed on ``key_col``.

    Membership is independent of partitioning and engine; different salts
    give independent subsets (train/val/test splits = disjoint salt-derived
    ranges of ONE hash, see ``deterministic_split``).
    """
    return df.where(sample_hash_col(F.col(key_col), salt) < frac_to_hex_threshold(frac))


def deterministic_split(
    df: DataFrame, fracs: list[float], key_col: str = "doc_id", salt: str = "split"
) -> list[DataFrame]:
    """Partition rows into len(fracs)+... disjoint deterministic splits by
    consecutive hash ranges (e.g. [0.8, 0.1, 0.1] → train/val/test). The
    splits are exhaustive iff fracs sum to 1; keys never migrate between
    splits when other data is added or removed."""
    bounds = []
    acc = 0.0
    for f in fracs:
        lo = frac_to_hex_threshold(acc)
        acc += f
        # Float accumulation can land epsilon-under 1.0 (e.g. [0.1]*10 sums
        # to 0.9999999999999999); without the snap, keys hashing to exactly
        # 'ffffffff' would fall in NO split, breaking exhaustiveness.
        hi = frac_to_hex_threshold(1.0 if acc >= 1.0 - 1e-9 else acc)
        bounds.append((lo, hi))
    h = sample_hash_col(F.col(key_col), salt)
    return [df.where((h >= lo) & (h < hi)) for lo, hi in bounds]


def stratified_sample(
    df: DataFrame,
    fracs: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strata",
    default_frac: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus balancing): each stratum
    value gets its own keep-fraction; strata absent from ``fracs`` keep
    ``default_frac``. One scan, no shuffle, no join — the per-stratum
    threshold is a literal CASE over the stratum column."""
    thr = None
    for val, f in fracs.items():
        cond = F.when(F.col(strata_col) == val, F.lit(frac_to_hex_threshold(f)))
        thr = cond if thr is None else thr.when(F.col(strata_col) == val, F.lit(frac_to_hex_threshold(f)))
    thr = (thr.otherwise(F.lit(frac_to_hex_threshold(default_frac)))
           if thr is not None else F.lit(frac_to_hex_threshold(default_frac)))
    return df.where(sample_hash_col(F.col(key_col), salt) < thr)
