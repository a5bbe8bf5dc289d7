"""Dedup family + similarity search tests against pure-Python oracles."""

from __future__ import annotations

import hashlib
import itertools
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from extremexp_knowledge_graph_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_dedup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_pairs,
    simhash_signatures,
)
from extremexp_knowledge_graph_spark.operators.similarity import (
    brute_force_topk,
    cosine_threshold_pairs,
    lsh_ann_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),          # near dup
    (4, "completely different content about spark engines here"),
    (5, "the  quick   brown fox jumps over the lazy dog"),       # ws-normalized dup of 1
    (6, ""),                                                     # empty
]


def _docs_df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


def py_shingles(text, n=3):
    toks = [t for t in __import__("re").findall("[a-z0-9]+", text.lower())]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_paragraph_dedup(spark):
    """CCNet-style paragraph scrub: shared paragraphs vanish from every doc,
    unique ones survive in order, within-doc repeats of a unique paragraph
    survive (the gate is cross-DOCUMENT frequency), whitespace variants of
    the same paragraph share a fingerprint, and all-boilerplate docs drop."""
    from pyspark.sql import Row

    from extremexp_knowledge_graph_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="SHARED banner\nalpha body one\nalpha body two"),
            Row(doc_id=2, text="SHARED  banner\nbeta body\nbeta body"),  # ws variant + in-doc repeat
            Row(doc_id=3, text="SHARED banner"),  # nothing survives
        ]
    )
    got = {r.doc_id: r for r in paragraph_dedup(docs, max_para_df=1).collect()}
    assert set(got) == {1, 2}  # doc 3 was pure boilerplate
    assert got[1].text == "alpha body one\nalpha body two"
    assert got[1].n_kept == 2 and got[1].n_dropped == 1
    # in-doc repeat kept twice: 'beta body' occurs in ONE doc only
    assert got[2].text == "beta body\nbeta body"
    assert got[2].n_kept == 2 and got[2].n_dropped == 1


def test_paragraph_dedup_idempotent(spark):
    """After one scrub every surviving paragraph is unique across docs, so a
    second pass is the identity — the fixpoint property that makes the op
    safe to re-run in resumed pipelines."""
    from pyspark.sql import Row

    from extremexp_knowledge_graph_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"SHARED banner\nbody {i} alpha\nbody {i} beta") for i in range(6)]
    )
    once = paragraph_dedup(docs, max_para_df=1)
    twice = paragraph_dedup(once.select("doc_id", "text"), max_para_df=1)
    a = {(r.doc_id, r.text) for r in once.collect()}
    b = {(r.doc_id, r.text) for r in twice.collect()}
    assert a == b and all("SHARED" not in t for _, t in a)


def test_minhash_pairs_between_self_matches_dedup_pairs(spark):
    """Cross-set blocking fed the same frame on both sides must agree with
    the self-join path (restricted to id_a < id_b) — pins that the
    incremental matcher finds exactly the pairs the batch matcher finds."""
    from pyspark.sql import Row

    from extremexp_knowledge_graph_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_pairs_between,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
            Row(doc_id=3, text="a completely different document about spark"),
            Row(doc_id=4, text="a completely different document about spark sql"),
            Row(doc_id=5, text="unrelated text with no twin at all here"),
        ]
    )
    kw = dict(threshold=0.3, num_hashes=8, bands=4, n=2)
    self_pairs = {(r.id_a, r.id_b, r.jaccard) for r in minhash_dedup_pairs(docs, **kw).collect()}
    cross = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_pairs_between(docs, docs, **kw).collect()
        if r.id_a < r.id_b
    }
    assert self_pairs == cross and len(self_pairs) >= 2


def test_exact_dedup(spark):
    df = _docs_df(spark)
    groups = {r.fingerprint: (r.n_copies, r.keeper_id) for r in exact_dup_groups(df).collect()}
    # 1,2,5 collapse (whitespace-normalized); 3,4,6 singletons
    assert sorted(v for v in groups.values()) == sorted([(3, 1), (1, 3), (1, 4), (1, 6)])
    survivors = {r.doc_id for r in exact_dedup(df).collect()}
    assert survivors == {1, 3, 4, 6}


def test_shingles_match_python(spark):
    df = _docs_df(spark)
    got = {}
    for r in shingles(df, 3).collect():
        got.setdefault(r.id, set()).add(r.shingle)
    for i, t in DOCS:
        want = py_shingles(t)
        assert got.get(i, set()) == want, i


def test_ngram_jaccard(spark):
    df = _docs_df(spark)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(df, 3, 0.5).collect()}
    # python oracle over all pairs
    sh = {i: py_shingles(t) for i, t in DOCS}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if j >= 0.5:
            want[(a, b)] = round(j, 6)
    assert pairs == want
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0


def test_minhash_signature_is_hash_min(spark):
    df = _docs_df(spark)
    sigs = {r.id: r.sig for r in minhash_signatures(df, num_hashes=4).collect()}
    for i, t in DOCS:
        sh = py_shingles(t)
        if not sh:
            assert i not in sigs  # no shingles → no signature row
            continue
        for j in range(4):
            want = min(hashlib.md5(f"{j}|{s}".encode()).hexdigest() for s in sh)
            assert sigs[i][j] == want


def test_minhash_lsh_finds_near_dups(spark):
    df = _docs_df(spark)
    cand = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df, 16, 4).collect()}
    assert (1, 2) in cand and (1, 5) in cand and (2, 5) in cand
    verified = {(r.id_a, r.id_b): r.jaccard for r in minhash_dedup_pairs(df, 0.5, 16, 4).collect()}
    assert verified[(1, 2)] == 1.0
    assert (1, 3) in verified  # near dup survives verification
    assert all(a != 4 and b != 4 for a, b in verified)  # unrelated doc never pairs


def test_simhash(spark):
    base = (
        "spark streaming shuffle partition broadcast join aggregate window "
        "watermark checkpoint lineage executor driver task stage codegen "
        "arrow pandas parquet iceberg "
    ) * 3
    near = base.replace("watermark", "waterline", 1)
    docs = DOCS + [(7, base), (8, near)]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    sigs = {r.id: r.simhash for r in simhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]  # identical text → identical signature
    assert sigs[6] is None or sigs[6] == 0
    # banding guarantees recall for hamming<=3 (pigeonhole); the long
    # near-dup pair happens to share a chunk at hamming 12 — calibrated
    # offline against the pure-python kernel
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_pairs(df, max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs[(7, 8)] == 12
    assert (1, 4) not in pairs  # unrelated docs don't pair


def _emb_df(spark, n=40, dim=8, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).astype("float32")
    rows = [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows), vecs


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    corpus, vecs = _emb_df(spark)
    queries = corpus.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    got = {}
    for r in brute_force_topk(corpus, queries, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.vec_id))
    v64 = vecs.astype("float64")
    norms = np.linalg.norm(v64, axis=1)
    for q in range(3):
        scores = v64 @ v64[q] / (norms * norms[q])
        order = sorted((-round(s, 6), i) for i, s in enumerate(scores) if i != q)[:5]
        want = [(rnk + 1, i) for rnk, (_, i) in enumerate(order)]
        assert sorted(got[q]) == want, q


def test_cosine_threshold_pairs(spark):
    corpus, _ = _emb_df(spark)
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    rows = cosine_threshold_pairs(corpus, queries, threshold=0.2).collect()
    assert all(r.score >= 0.2 and r.vec_id != r.query_id for r in rows)


def test_lsh_ann_recall(spark):
    corpus, _ = _emb_df(spark, n=120, dim=8)
    queries = corpus.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(corpus, queries, k=3).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_ann_topk(corpus, queries, k=3, dim=8, n_planes=4, n_tables=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_ann_recall_and_determinism(spark):
    """IVF top-k: decent recall vs brute force at nprobe=nlist/2; exact
    equality to brute force when probing every list (degenerate case);
    deterministic across partitionings."""
    import numpy as np

    from extremexp_knowledge_graph_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
    )

    rng = np.random.RandomState(3)
    # clustered corpus so the coarse quantizer has structure to find
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        v = centers[i % 4] + rng.standard_normal(16) * 0.5
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id < 8").selectExpr("vec_id as query_id", "embedding as q_embedding")

    bf = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, q, k=5).collect()}
    ivf = {(r.query_id, r.vec_id) for r in ivf_ann_topk(emb, q, k=5, nlist=8, nprobe=4).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.6, recall

    # probing all lists ⇒ identical to brute force
    full = {(r.query_id, r.vec_id, r.score, r.rnk)
            for r in ivf_ann_topk(emb, q, k=5, nlist=8, nprobe=8).collect()}
    bf_full = {(r.query_id, r.vec_id, r.score, r.rnk)
               for r in brute_force_topk(emb, q, k=5).collect()}
    assert full == bf_full

    # partitioning-invariant
    ivf2 = {(r.query_id, r.vec_id)
            for r in ivf_ann_topk(emb.repartition(13), q, k=5, nlist=8, nprobe=4).collect()}
    assert ivf2 == ivf


def _numpy_ivf_fit(ids, V, nlist, iters, seed):
    """Pure-numpy replica of ivf_fit_centroids' deterministic recursion
    (md5-ordered init, argmin ties to lowest index, per-dim mean), used to
    measure Voronoi margins — NOT as the engine oracle."""
    import numpy as np

    order = sorted(
        range(len(ids)), key=lambda j: hashlib.md5(f"{ids[j]}|{seed}".encode()).hexdigest()
    )
    C = V[order[:nlist]].astype(np.float64).copy()
    margins = []
    for _ in range(iters):
        d = -2.0 * (V @ C.T) + (C * C).sum(axis=1)
        srt = np.sort(d, axis=1)
        margins.append(float(np.min(srt[:, 1] - srt[:, 0])))
        a = np.argmin(d, axis=1)
        for c in range(nlist):
            m = a == c
            if m.any():
                C[c] = V[m].mean(axis=0)
    return C, margins


def test_ivf_oracle_margins():
    """The ann_ivf driver oracle replays the Lloyd fit in DuckDB; engines
    differ by float-summation order (~1e-13 on these magnitudes). Safe iff
    every assignment/probe decision has a margin orders of magnitude above
    that — assert it for the scale factors the driver actually runs."""
    import numpy as np
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01"):
        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        ids = t["vec_id"].to_pylist()
        V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        C, margins = _numpy_ivf_fit(ids, V, nlist=16, iters=3, seed=7)
        assert min(margins) > 1e-6, (sf, margins)
        d = -2.0 * (V @ C.T) + (C * C).sum(axis=1)
        srt = np.sort(d, axis=1)
        assert float((srt[:, 1] - srt[:, 0]).min()) > 1e-6, sf  # corpus assign
        dq = srt[np.asarray(ids) < 10]
        assert float((dq[:, 4] - dq[:, 3]).min()) > 1e-6, sf  # nprobe=4 boundary


def test_ivf_fit_limit_sampling(spark):
    """fit_limit bounds the Lloyd fit to a deterministic sample; quantizer
    quality survives (recall within noise of the full fit) and probing all
    lists still degenerates to exact brute force."""
    import numpy as np

    from extremexp_knowledge_graph_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((4, 16)) * 3
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.standard_normal(16) * 0.5])
        for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id < 8").selectExpr("vec_id as query_id", "embedding as q_embedding")

    bf = {(r.query_id, r.vec_id, r.score, r.rnk) for r in brute_force_topk(emb, q, k=5).collect()}
    full_probe = {
        (r.query_id, r.vec_id, r.score, r.rnk)
        for r in ivf_ann_topk(emb, q, k=5, nlist=8, nprobe=8, fit_limit=60).collect()
    }
    assert full_probe == bf

    bf_pairs = {(a, b) for a, b, _, _ in bf}
    sampled = {
        (r.query_id, r.vec_id)
        for r in ivf_ann_topk(emb, q, k=5, nlist=8, nprobe=4, fit_limit=60).collect()
    }
    assert len(bf_pairs & sampled) / len(bf_pairs) >= 0.6
