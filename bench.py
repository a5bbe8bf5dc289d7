"""Benchmark driver — one JSON line on stdout.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": "...",
     "kg_triples": N, "kg_triples_per_sec": N}

The KG-construction number is the BASELINE.md comparison point: the
reference's single-core rdflib pipeline sustains order 10^2-10^3 triples/s
(BASELINE.md "Derived triples/sec"); ours is reported as kg_triples_per_sec.

Two tiers: the FROZEN headline set (17 queries, best-of-3 — `value` /
`queries`, comparable across rounds) and the extended tier (every other
`__spark_entry__.queries()` key, best-of-2 — `extended_queries`), so the
whole oracled surface has timing legs and a regression anywhere is visible
in BENCH_r*.json.

Scaling evidence (north rule, sandbox form) lives in tools/bench_scaling.py
→ BENCH.md: same job at local[8] vs local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

#: FROZEN round-1 query set — the cross-round comparison basis. The full
#: suite grows as operators are added (its total is suite growth, not
#: regression); core_suite_sec is the number to compare round over round.
CORE_SUITE = [
    "kg_construct", "kg_construct_store", "kg_papers_fixture", "dedup_exact",
    "dedup_minhash", "dedup_simhash", "kg_canonicalize", "ann_topk", "ann_lsh",
    "text_stats", "sql_pricing_summary", "sql_top_customers", "events_hourly",
]


def build_queries(sf_dir: str):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def kg_construct(spark):
        """Full KG construction over documents (extract → triples → dedup)."""
        from extremexp_knowledge_graph_spark.operators.pattern_extract import (
            gazetteer_mentions,
            line_triples,
            svo_triples,
        )
        from extremexp_knowledge_graph_spark.schema import TRIPLE_KEY

        from extremexp_knowledge_graph_spark.sources.util import ensure_min_parallelism

        docs = ensure_min_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        svo_docs = docs.withColumn("text", F.replace(F.col("text"), F.lit(" the "), F.lit(" is ")))
        t = (
            line_triples(docs)
            .unionByName(svo_triples(svo_docs))
            .unionByName(gazetteer_mentions(docs, entrymod.DOC_GAZETTEER))
            .dropDuplicates(TRIPLE_KEY)
        )
        return t.count()

    def kg_papers_fixture(spark):
        """Reference-corpus mapper (the golden-parity pipeline) end-to-end."""
        from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
        from extremexp_knowledge_graph_spark.sources.papers_json import read_papers_json

        fixture = "/root/reference/extremexp_kg_matic/data/five_papers.json"
        if not os.path.exists(fixture):
            return 0
        return papers_to_triples(read_papers_json(spark, fixture)).count()

    def kg_construct_store(spark):
        """Construction + salted bucketed store write (the full S4 path —
        'end-to-end triples/sec' including materialization I/O)."""
        import shutil
        import tempfile

        from extremexp_knowledge_graph_spark.operators.pattern_extract import (
            gazetteer_mentions,
            line_triples,
            svo_triples,
        )
        from extremexp_knowledge_graph_spark.plans.kg_store import write_triples
        from extremexp_knowledge_graph_spark.schema import TRIPLE_KEY
        from extremexp_knowledge_graph_spark.sources.util import ensure_min_parallelism

        docs = ensure_min_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        svo_docs = docs.withColumn("text", F.replace(F.col("text"), F.lit(" the "), F.lit(" is ")))
        t = (
            line_triples(docs)
            .unionByName(svo_triples(svo_docs))
            .unionByName(gazetteer_mentions(docs, entrymod.DOC_GAZETTEER))
            .dropDuplicates(TRIPLE_KEY)
        )
        out = tempfile.mkdtemp(prefix="bench_store_")
        try:
            write_triples(t, out)
            return spark.read.parquet(out).count()
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def from_entry(name):
        def run(spark):
            return qs[name](spark, sf_dir).count()

        return run

    headline = {
        "kg_construct": kg_construct,
        "kg_construct_store": kg_construct_store,
        "kg_papers_fixture": kg_papers_fixture,
        "kg_papers_triples": from_entry("kg_papers_triples"),
        "dedup_exact": from_entry("dedup_exact"),
        "dedup_minhash": from_entry("dedup_minhash"),
        "dedup_simhash": from_entry("dedup_simhash"),
        "kg_canonicalize": from_entry("kg_canonicalize"),
        "ann_topk": from_entry("ann_topk"),
        "ann_lsh": from_entry("ann_lsh"),
        "ann_ivf": from_entry("ann_ivf"),
        "dedup_embedding_lsh": from_entry("dedup_embedding_lsh"),
        "multimodal_features": from_entry("multimodal_features"),
        "text_stats": from_entry("text_stats"),
        "sql_pricing_summary": from_entry("sql_pricing_summary"),
        "sql_top_customers": from_entry("sql_top_customers"),
        "events_hourly": from_entry("events_hourly"),
    }
    # extended tier: EVERY remaining driver query gets a timing leg so a
    # perf regression anywhere on the oracled surface is visible in
    # BENCH_r*.json (round-4 verdict item #1) — the headline set above stays
    # frozen as the cross-round comparison basis.
    extended = {name: from_entry(name) for name in sorted(qs) if name not in headline}
    return headline, extended


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from extremexp_knowledge_graph_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: run the full query set once at the smallest SF so JVM start,
    # whole-stage codegen compilation, and Python-worker fork costs are paid
    # outside the timed pass (identical plan shapes → codegen cache hits).
    # Steady-state throughput is the number that projects to cluster scale.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    t_warm = time.monotonic()
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        wh, wx = build_queries(warm_dir)
        for fn in {**wh, **wx}.values():
            fn(spark)
    else:
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    warmup_s = round(time.monotonic() - t_warm, 3)

    headline, extended = build_queries(sf_dir)
    timings: dict[str, float] = {}
    ext_timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    ext_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS_EXT", "2"))

    def time_set(queries, sink, n):
        for name, fn in queries.items():
            best = None
            for _ in range(n):  # best-of-N: single-JVM runs are noisy
                t0 = time.monotonic()
                counts[name] = fn(spark)
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            sink[name] = round(best, 3)

    time_set(headline, timings, repeats)
    time_set(extended, ext_timings, ext_repeats)

    total = round(sum(timings.values()), 3)
    core = round(sum(timings[q] for q in CORE_SUITE if q in timings), 3)
    kg_tps = round(counts["kg_construct"] / timings["kg_construct"]) if timings["kg_construct"] else None
    out = {
        "metric": "kg-construction + training-data operator suite, end-to-end wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "core_suite_sec": core,
        "core_suite_queries": len([q for q in CORE_SUITE if q in timings]),
        "kg_triples": counts["kg_construct"],
        "kg_triples_per_sec": kg_tps,
        "warmup_sec": warmup_s,
        # extended tier: every other driver query, best-of-N_ext — full
        # oracled-surface regression visibility (kept out of `value` so the
        # headline total stays comparable across rounds)
        "extended_queries": ext_timings,
        "extended_suite_sec": round(sum(ext_timings.values()), 3),
        "full_suite_sec": round(total + sum(ext_timings.values()), 3),
        "rows": counts,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
