"""Deduplication family — exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding near-dup.

These are the training-data-pipeline operators a 100 TB corpus needs before
KG extraction (and the blocking stage the canonicalizer reuses, SURVEY.md §7
S3). Design notes per operator:

* **exact**: hash-groupBy on a content fingerprint; one shuffle, map-side
  partial aggregation. The winner is the minimum id — deterministic under
  any partitioning.
* **n-gram Jaccard**: explode distinct shingles → self-join on shingle →
  per-pair intersection counts vs precomputed set sizes. The shingle join is
  the scale risk (hot shingles ~ stopword runs); callers should cap on
  document frequency with ``max_shingle_df`` — the classic "drop the
  boilerplate shingles" guard.
* **MinHash**: k independent permutations simulated by lexicographic-min of
  ``md5(seed || shingle)`` — hash-based min survives any partitioning and
  re-sharding, needs no global state, and is reproducible in plain SQL
  (DuckDB oracle). Banding turns signatures into LSH keys; candidate pairs
  then verify with true Jaccard.
* **SimHash**: 64-bit vectorized kernel (numpy inside a pandas UDF);
  near-dup pairs found by banding the signature into 4×16-bit chunks
  (Hamming ≤ 3 ⇒ at least one chunk equal — pigeonhole).
* **embedding near-dup**: exact cosine over candidate pairs; pair
  generation via the same banding ideas lives in similarity.py.

All shuffles key on content-derived values (fingerprint, shingle, band), so
skew comes only from genuinely hot content — mitigations: document-frequency
caps here, AQE skew-join at session level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

import pandas as pd


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def content_fingerprint(text: Column) -> Column:
    """Stable content hash; whitespace-normalized, case-preserved."""
    return F.md5(F.regexp_replace(text, r"\s+", " "))


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per duplicate-group: (fingerprint, n_copies, keeper_id)."""
    return (
        df.select(F.col(id_col).alias("id"), content_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").cast("long").alias("n_copies"), F.min("id").alias("keeper_id"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Survivors only (keeper per content group), original schema."""
    w = exact_dup_groups(df, id_col, text_col).select("keeper_id")
    return df.join(w, df[id_col] == w.keeper_id, "left_semi")


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_para_df: int = 1,
) -> DataFrame:
    """CCNet-style paragraph-level dedup: drop every paragraph whose
    (whitespace-normalized) fingerprint appears in more than ``max_para_df``
    documents — the standard boilerplate/chrome scrub for web corpora, where
    near-identical docs share navigation/footer paragraphs that document-
    level dedup can't touch. Returns (id_col, text, n_kept, n_dropped) with
    the surviving paragraphs reassembled in original order; documents whose
    every paragraph was boilerplate disappear (CCNet drops empty shards).

    Scale shape: one fingerprint-keyed shuffle for the document-frequency
    count (map-side partial agg) + one id-keyed shuffle to reassemble; the
    fingerprint join is a hot-key risk ONLY for the boilerplate paragraphs
    themselves, whose groups carry one count row each — no row blowup.
    """
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "para"),
    ).where(F.trim("para") != "")
    paras = paras.withColumn("fp", content_fingerprint(F.col("para")))
    dfreq = paras.groupBy("fp").agg(F.countDistinct("id").alias("pdf"))
    k = paras.join(dfreq, "fp").withColumn("keep", F.col("pdf") <= max_para_df)
    agg = k.groupBy("id").agg(
        # when() yields NULL for dropped rows and collect_list skips NULLs,
        # so one aggregation carries both the kept set and the counts
        F.array_sort(
            F.collect_list(F.when(F.col("keep"), F.struct("pos", "para")))
        ).alias("ps"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).cast("long").alias("n_dropped"),
    )
    return agg.where(F.col("n_kept") > 0).select(
        F.col("id").alias(id_col),
        F.concat_ws("\n", F.transform("ps", lambda s: s["para"])).alias("text"),
        "n_kept",
        "n_dropped",
    )


# ---------------------------------------------------------------------------
# Shingles + Jaccard
# ---------------------------------------------------------------------------
def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("toks"))
    # guard: sequence(0, k) is descending for k<0, so gate on size >= n
    idx = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - F.lit(n))
    ).otherwise(F.array().cast("array<int>"))
    sh = toks.select(
        "id",
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice(F.col("toks"), i + 1, n), " "))
        ).alias("shingle"),
    )
    return sh.distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold: (id_a, id_b, jaccard).

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    before the self-join — the boilerplate guard that keeps the join from
    quadratic blowup on hot shingles at scale.
    """
    sh = shingles(df, n, id_col, text_col)
    if max_shingle_df:
        hot = sh.groupBy("shingle").count().where(F.col("count") > max_shingle_df).select("shingle")
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig ARRAY<STRING>[num_hashes]) — sig[j] = min(md5(j||'|'||shingle)).

    Hash-min is order/partitioning-independent and SQL-reproducible; 8 hex
    chars of md5 would suffice but we keep the full digest for clarity.
    """
    sh = shingles(df, n, id_col, text_col)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"))


def _band_rows(
    df: DataFrame, num_hashes: int, bands: int, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, band, band_sig) — one row per document per LSH band."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, n, id_col, text_col)
    return sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("", *[F.col("sig")[b * r + i] for i in range(r)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band. (id_a, id_b)."""
    band_rows = _band_rows(df, num_hashes, bands, n, id_col, text_col)
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_sig") == F.col("b.band_sig")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_band_rows(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Public form of the banded-signature relation ``(id, band, band_sig)``.

    This is the frame an incremental deployment PERSISTS append-only next to
    its entity map (signatures never change for an existing item), so that
    matching each new ingest batch against the history costs a columnar scan
    of this table instead of re-shingling + re-min-hashing the entire
    history per batch (``minhash_pairs_between``'s ``right_band_rows``)."""
    return _band_rows(df, num_hashes, bands, n, id_col, text_col)


def minhash_pairs_between(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    right_band_rows: DataFrame | None = None,
) -> DataFrame:
    """Cross-set LSH near-dup pairs: (id_a ∈ left, id_b ∈ right, jaccard).

    Candidates come only from left×right band-bucket collisions — the right
    corpus never self-joins. This is the incremental-batch shape: matching a
    small delta of N_new items against a 10^9-item history costs
    O(N_new × bucket-collision rate) for the join, and — when the caller
    passes ``right_band_rows``, the persisted ``(id, band, band_sig)``
    signature table for the history (``minhash_band_rows``) — the history
    side costs ONE columnar scan of that table: no re-shingling, no
    re-min-hashing. Jaccard verification shingles only the rows that
    actually appear in a candidate pair (a semi-join-pruned sliver of each
    side), never the full history. Without ``right_band_rows`` the
    signatures are derived from ``right`` in-plan (full right-side
    preprocessing — the one-shot/small-history path). Ids appearing in BOTH
    sets pair only with other ids (a != b guard). Verified with true
    Jaccard like ``minhash_dedup_pairs``.
    """
    la = _band_rows(left, num_hashes, bands, n, id_col, text_col).alias("a")
    if right_band_rows is not None:
        rb = right_band_rows.select("id", "band", "band_sig").alias("b")
    else:
        rb = _band_rows(right, num_hashes, bands, n, id_col, text_col).alias("b")
    cand = (
        la.join(rb, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_sig") == F.col("b.band_sig")))
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Verification reads only candidate rows: semi-join each side down to
    # the ids that collided in ≥1 band before shingling. Shingle sets (and
    # therefore sizes + intersections) per doc are unchanged by the row
    # restriction, so results are identical to verifying over the full sets.
    left_c = left.join(
        cand.select(F.col("id_a").alias(id_col)).distinct(), id_col, "left_semi"
    )
    right_c = right.join(
        cand.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_semi"
    )
    sh_l = shingles(left_c, n, id_col, text_col)
    sh_r = shingles(right_c, n, id_col, text_col)
    sz_l = sh_l.groupBy("id").agg(F.count("*").alias("sz_a")).withColumnRenamed("id", "id_a")
    sz_r = sh_r.groupBy("id").agg(F.count("*").alias("sz_b")).withColumnRenamed("id", "id_b")
    inter = (
        cand.join(sh_l.withColumnRenamed("id", "id_a"), "id_a")
        .join(sh_r.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sz_l, "id_a")
        .join(sz_r, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH-blocked near-dup pairs verified with true Jaccard (scale path:
    candidates come from banding, not from the quadratic shingle join)."""
    cand = minhash_lsh_pairs(df, num_hashes, bands, n, id_col, text_col)
    sh = shingles(df, n, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized numpy kernel)
# ---------------------------------------------------------------------------
def _simhash_kernel(texts: pd.Series) -> pd.Series:
    import hashlib

    import numpy as np

    out = []
    for t in texts:
        if not isinstance(t, str) or not t:
            out.append(None)
            continue
        toks = list(dict.fromkeys(t.lower().split()))
        if not toks:
            out.append(0)
            continue
        hashes = np.array(
            [int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big") for tok in toks],
            dtype=np.uint64,
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        out.append(int(np.int64(sig)))  # two's-complement into BIGINT
    return pd.Series(out, dtype="object")


def simhash_col():
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_simhash_kernel, LongType())


def simhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col).alias("id"), simhash_col()(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs by SimHash banding: Hamming ≤ 3 over 64 bits ⇒ at least
    one of 4 16-bit chunks identical (pigeonhole) → join per chunk, verify."""
    sig = simhash_signatures(df, id_col, text_col).where(F.col("simhash").isNotNull())
    chunks = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)])
        ).alias("chunk_no", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, ["chunk_no", "chunk"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )
