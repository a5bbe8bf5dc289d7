"""Triple-parity report vs the reference's golden output (north rule:
P/R ≥ 0.95 on the reference's fixture corpus).

Runs the Spark mapper on five_papers.json, parses the reference's
checked-in five_papers.ttl (produced by its rdflib pipeline,
extremexp_kg_matic/src/utils.py:209-365 + src/main.py one-shot), and prints
precision/recall over canonical (subj, pred, obj_lexical, obj_is_iri,
obj_datatype) tuples. Rewrites PARITY.md with the latest result
(one report per file; git history keeps prior runs).

Usage: python tools/parity_report.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

FIXTURE = "/root/reference/extremexp_kg_matic/data/five_papers.json"
GOLDEN = "/root/reference/extremexp_kg_matic/data/five_papers.ttl"


def main() -> None:
    from ttl_oracle import load_golden

    from extremexp_knowledge_graph_spark.operators.papers_to_triples import papers_to_triples
    from extremexp_knowledge_graph_spark.session import get_spark
    from extremexp_knowledge_graph_spark.sources.papers_json import read_papers_json

    spark = get_spark("parity", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = papers_to_triples(read_papers_json(spark, FIXTURE)).collect()
    got = {(r.subj, r.pred, r.obj, r.obj_is_iri, r.obj_datatype) for r in rows}
    want = load_golden(GOLDEN)
    inter = got & want
    p = len(inter) / len(got) if got else 0.0
    r = len(inter) / len(want) if want else 0.0
    result = {
        "engine_triples": len(got),
        "reference_triples": len(want),
        "matching": len(inter),
        "precision": round(p, 6),
        "recall": round(r, 6),
        "rule": "P/R >= 0.95",
        "pass": p >= 0.95 and r >= 0.95,
    }
    print(json.dumps(result))
    spark.stop()

    md = ROOT / "PARITY.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    section = f"""# PARITY — triple parity vs reference golden output

({stamp}) Spark mapper on the reference's own fixture corpus
(`five_papers.json`, 5 papers / 224 results) vs the reference pipeline's
checked-in golden Turtle (`five_papers.ttl`), compared as canonical
`(subj, pred, obj_lexical, obj_is_iri, obj_datatype)` tuples — including
the typed-vs-untyped literal quirk (SURVEY.md §1.2) and rdflib's decimal
rendering:

| metric | value |
|---|---|
| engine triples | {len(got):,} |
| reference triples | {len(want):,} |
| matching | {len(inter):,} |
| **precision** | **{p:.4f}** |
| **recall** | **{r:.4f}** |

Rule: P/R ≥ 0.95 → **{"PASS" if result["pass"] else "FAIL"}** (exact set
equality{"" if got == want else " NOT"} achieved). Continuously enforced by
`tests/test_golden_parity.py` (`python -m pytest -x -q`).
"""
    md.write_text(section)


if __name__ == "__main__":
    main()
