"""spark-submit entry point for the S1-S4 web-regime KG pipeline.

The deploy shape the north rule mandates:

    python tools/make_pyfiles.py
    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/extremexp_knowledge_graph_spark.zip \
        tools/submit_web_pipeline.py --pages 10000 --out /path/kg_out

The job generates the deterministic synthetic pages corpus (stand-in for
the Common-Crawl Iceberg table; pass ``--pages-path`` to read a real
``pages`` parquet/Iceberg table instead), runs extract → link →
canonicalize → materialize with manifest resume, and prints one JSON stats
line. Re-submitting with the same ``--out`` resumes instead of recomputing.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000, help="synthetic corpus size")
    ap.add_argument("--pages-path", default=None, help="read pages table from this path instead")
    ap.add_argument("--out", required=True, help="output dir (docs/linked/entity_map/triples/manifest)")
    ap.add_argument("--buckets", type=int, default=16, help="url buckets = resume granularity")
    args = ap.parse_args()

    from extremexp_knowledge_graph_spark.plans.web_pipeline import run_web_pipeline
    from extremexp_knowledge_graph_spark.session import get_spark
    from extremexp_knowledge_graph_spark.sources.synthetic_pages import generate_pages

    spark = get_spark("kg-web-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    pages = (
        spark.read.parquet(args.pages_path)
        if args.pages_path
        else generate_pages(spark, args.pages)
    )
    stats = run_web_pipeline(spark, pages, args.out, n_url_buckets=args.buckets)
    n_triples = spark.read.parquet(f"{args.out}/triples").count()
    print(json.dumps({"stats": stats, "store_triples": n_triples}))
    spark.stop()


if __name__ == "__main__":
    main()
