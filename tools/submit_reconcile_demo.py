"""spark-submit demo: reconcile_canonicalization at 100k-page store scale.

Round-4 verdict item #3: the reconciler is proven at pytest scale
(tests/test_incremental_v2.py::test_reconcile_converges_to_batch); this
drives the SAME deferred-bridge scenario at the 100k-page spark-submit
scale of BENCH.md's "100k pages" section and spot-checks store equality
against a from-scratch build.

    python tools/make_pyfiles.py
    spark-submit --master local[32] --driver-memory 8g \
        --py-files dist/extremexp_knowledge_graph_spark.zip \
        tools/submit_reconcile_demo.py --pages 100000 --out /tmp/recdemo

Scenario: the synthetic corpus is ingested in three incremental submits
(60% → 80% → 100%). Three bridge entities ride along — E_A and E_B (below
the merge threshold, linked from batch-1 pages) and E_C (above-threshold to
both, linked only from a batch-3 page) — so incremental canonicalization
defers the A↔B merge (its stability contract) and the store accumulates
IRIs a batch run would have merged. The reconcile then: re-clusters all
entities, derives the moves, broadcast-rewrites the multi-million-triple
store, swaps map+sigs. A from-scratch build over the identical full corpus
is the equality oracle (map exact-equal; store count + order-free xxhash64
checksum over TRIPLE_KEY).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--out", required=True, help="work dir; uses <out>/inc and <out>/full")
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from extremexp_knowledge_graph_spark.plans import web_pipeline as wp
    from extremexp_knowledge_graph_spark.schema import TRIPLE_KEY
    from extremexp_knowledge_graph_spark.session import get_spark
    from extremexp_knowledge_graph_spark.sources.synthetic_pages import generate_pages

    spark = get_spark("kg-reconcile-demo")
    spark.sparkContext.setLogLevel("WARN")

    E_A = "alpha beta gamma delta one"
    E_B = "alpha beta gamma delta two"
    E_C = "alpha beta gamma delta"
    aliases = wp.default_aliases(spark).unionByName(
        spark.createDataFrame(
            [("qqalpha", E_A, 1.0, E_A), ("qqbeta", E_B, 1.0, E_B), ("qqgamma", E_C, 1.0, E_C)],
            ["alias", "entity_id", "prior", "context"],
        )
    )

    def bridge_pages(upto_batch: int):
        specs = [("https://bridge.example/a", "system uses qqalpha here", 1),
                 ("https://bridge.example/b", "network has qqbeta features", 1),
                 ("https://bridge.example/c", "pipeline contains qqgamma models", 3)]
        rows = [
            (url, f"<html><head></head><body><p>{txt}</p></body></html>".encode())
            for url, txt, b in specs
            if b <= upto_batch
        ]
        return spark.createDataFrame(rows, ["url", "html"]).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
            F.lit(None).cast("string").alias("text"), F.lit("en").alias("lang"),
        )

    def corpus(n_pages: int, upto_batch: int):
        return generate_pages(spark, n_pages).unionByName(bridge_pages(upto_batch))

    inc, full = f"{args.out}/inc", f"{args.out}/full"
    sizes = [int(args.pages * 0.6), int(args.pages * 0.8), args.pages]
    walls = []
    for i, (n, b) in enumerate(zip(sizes, (1, 2, 3)), 1):
        t0 = time.monotonic()
        wp.run_web_pipeline(spark, corpus(n, b), inc, aliases=aliases, n_url_buckets=args.buckets)
        walls.append(round(time.monotonic() - t0, 1))
        print(f"increment {i}: {n} pages, {walls[-1]} s", flush=True)

    emap_pre = {r.entity_id: r.canonical_id
                for r in spark.read.parquet(f"{inc}/entity_map").collect()}
    assert emap_pre[E_A] != emap_pre[E_B], "fixture failed to defer the A-B merge"

    t0 = time.monotonic()
    res = wp.reconcile_canonicalization(spark, inc, n_buckets=16)
    rec_wall = round(time.monotonic() - t0, 1)
    print(f"reconcile: {rec_wall} s, {res}", flush=True)

    t0 = time.monotonic()
    wp.run_web_pipeline(spark, corpus(args.pages, 3), full, aliases=aliases,
                        n_url_buckets=args.buckets)
    full_wall = round(time.monotonic() - t0, 1)

    def store_sig(path):
        t = spark.read.parquet(f"{path}/triples")
        row = t.select(
            F.count(F.lit(1)).alias("n"),
            # 64-bit hashes summed in decimal: exact, order-free, no ANSI
            # long overflow at any store size
            F.sum(F.xxhash64(*TRIPLE_KEY).cast("decimal(38,0)")).alias("chk"),
        ).collect()[0]
        return int(row.n), int(row.chk)

    m_inc = {r.entity_id: r.canonical_id
             for r in spark.read.parquet(f"{inc}/entity_map").collect()}
    m_full = {r.entity_id: r.canonical_id
              for r in spark.read.parquet(f"{full}/entity_map").collect()}
    sig_inc, sig_full = store_sig(inc), store_sig(full)
    out = {
        "pages": args.pages,
        "increment_walls_s": walls,
        "reconcile_wall_s": rec_wall,
        "reconcile": res,
        "full_build_wall_s": full_wall,
        "map_equal": m_inc == m_full,
        "store_inc": sig_inc,
        "store_full": sig_full,
        "store_equal": sig_inc == sig_full,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
