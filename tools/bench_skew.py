"""Hot-subject skew demonstration (SURVEY.md §4.2 item 1: salting must be
*demonstrated*, not just configured).

Builds a triple-like dataset where one subject ("Method_Adam"-class head
entity) owns ``hot_frac`` of all rows, then times the store-layout shuffle
two ways on the same input:

  unsalted — repartition(subj_bucket): every row of the hot subject lands
             in ONE task → straggler.
  salted   — kg_store.with_layout: repartition(subj_bucket, salt) spreads
             the hot subject over n_salt tasks; on-disk layout unchanged
             (salt is dropped before write).

Prints one JSON line with both times + the max-task row counts, appends a
section to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    rows = int(os.environ.get("SKEW_ROWS", "4000000"))
    hot_frac = float(os.environ.get("SKEW_HOT_FRAC", "0.6"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from pyspark.sql import functions as F

    from extremexp_knowledge_graph_spark.plans.kg_store import DEFAULT_BUCKETS, with_layout
    from extremexp_knowledge_graph_spark.session import get_spark

    spark = get_spark("skew-bench", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    hot_n = int(rows * hot_frac)
    base = spark.range(rows).select(
        F.when(F.col("id") < hot_n, F.lit("http://example.org/Method_Adam"))
        .otherwise(F.concat(F.lit("http://example.org/e"), F.col("id")))
        .alias("subj"),
        F.lit("http://example.org/p").alias("pred"),
        F.concat(F.lit("v"), F.col("id")).alias("obj"),
        F.lit(False).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("prov"),
    )
    base = base.repartition(2 * cpus).localCheckpoint()  # fix input layout

    def timed(df):
        # count() per output partition forces the exchange and measures the
        # straggler; mapInPandas would hide codegen, glom via rdd is direct
        t0 = time.monotonic()
        sizes = df.rdd.glom().map(len).collect()
        return time.monotonic() - t0, max(sizes)

    unsalted = base.withColumn(
        "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(DEFAULT_BUCKETS))
    ).repartition(F.col("subj_bucket"))
    salted = with_layout(base)

    # warm both plans once
    timed(unsalted)
    timed(salted)
    t_un, max_un = timed(unsalted)
    t_sa, max_sa = timed(salted)

    result = {
        "rows": rows,
        "hot_frac": hot_frac,
        "unsalted": {"sec": round(t_un, 3), "max_task_rows": max_un},
        "salted": {"sec": round(t_sa, 3), "max_task_rows": max_sa},
        "straggler_reduction": round(max_un / max_sa, 2),
        "speedup": round(t_un / t_sa, 2),
    }
    print(json.dumps(result))

    md = Path(__file__).resolve().parents[1] / "BENCH.md"
    section = f"""
## Hot-subject skew: salted vs unsalted store shuffle ({time.strftime("%Y-%m-%d %H:%M:%S")})

{rows:,} triples, one head subject owning {hot_frac:.0%} of rows
(`Method_Adam`-class hot entity, SURVEY.md §4.2), identical input layout,
same bucket count ({DEFAULT_BUCKETS}); shuffle = the S4 store-write exchange:

| layout | wall sec | max rows in one task |
|---|---|---|
| repartition(subj_bucket) — unsalted | {t_un:.3f} | {max_un:,} |
| `kg_store.with_layout` — salted | {t_sa:.3f} | {max_sa:,} |

Salting spreads the hot subject over {result["straggler_reduction"]}× more
tasks (straggler max {max_un:,} → {max_sa:,} rows) for a {result["speedup"]}×
wall-clock win on the exchange; the on-disk layout (bucket dirs) is
identical — salt is shuffle-only.
"""
    md.write_text((md.read_text() if md.exists() else "# BENCH\n") + section)


if __name__ == "__main__":
    main()
