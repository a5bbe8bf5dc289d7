"""Package the engine for ``spark-submit --py-files`` (north rule deploy
shape): zips ``extremexp_knowledge_graph_spark/`` into
``dist/extremexp_knowledge_graph_spark.zip``.

Usage:
    python tools/make_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/extremexp_knowledge_graph_spark.zip \
        tools/submit_web_pipeline.py --pages 10000 --out /path/kg_out
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
PKG = ROOT / "extremexp_knowledge_graph_spark"
OUT = ROOT / "dist" / "extremexp_knowledge_graph_spark.zip"


def main() -> Path:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
