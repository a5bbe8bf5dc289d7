"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on
DuckDB over the same sf dir, then compares row count + column names + an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized: floats via repr, None as ␀).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("\x1f".join(_canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from extremexp_knowledge_graph_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:24s} rows={len(rows):7d}  (rows-only, no oracle)  {spark_s:.1f}s")
            continue
        orows_rel = con.sql(oracles[name])
        ocols = [c for c in orows_rel.columns]
        orows = orows_rel.fetchall()
        ok_count = len(rows) == len(orows)
        ok_cols = sorted(cols) == sorted(ocols)
        h_s = _hash_rows(cols, rows)
        h_o = _hash_rows(ocols, orows)
        ok_hash = h_s == h_o
        status = "OK " if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name:24s} {status} rows={len(rows)}/{len(orows)} cols={'=' if ok_cols else cols} "
            f"hash={'=' if ok_hash else (h_s[:8] + '!=' + h_o[:8])}  {spark_s:.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            # show a few differing rows for debugging
            import collections

            order_s = sorted(range(len(cols)), key=lambda i: cols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ms = collections.Counter("\x1f".join(_canon_cell(r[i]) for i in order_s) for r in rows)
            mo = collections.Counter("\x1f".join(_canon_cell(r[i]) for i in order_o) for r in orows)
            only_s = list((ms - mo).elements())[:3]
            only_o = list((mo - ms).elements())[:3]
            for x in only_s:
                print("    spark-only:", x.replace("\x1f", " | ")[:200])
            for x in only_o:
                print("    oracle-only:", x.replace("\x1f", " | ")[:200])
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
