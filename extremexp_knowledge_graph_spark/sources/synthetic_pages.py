"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §2).

Generates the web-regime input relation
    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
entirely inside Spark (``spark.range`` + ``mapInPandas`` — no driver-side
loops, scales linearly with partitions). Every row is a pure function of
``(seed, id)``, so any two runs — at any parallelism — produce identical
bytes, which is what makes the extract kernel's "byte-identical text per
url" invariant (BASELINE.json input_hint) testable.

The generated body text embeds the reference's SVO extraction grammar
``(\\w+) (is|has|contains|includes|uses|implements) (\\w+)``
(extremexp_kg_matic/src/utils.py:69-76) plus gazetteer entity names, so
expected triples are computable in tests. The HTML wraps the text in
deterministic boilerplate (doctype, head/script/style, nav, aside, footer)
that the extraction kernel must strip exactly.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from extremexp_knowledge_graph_spark.schema import PAGES_SCHEMA

#: Entity gazetteer — names that the extraction/linking stages can anchor on.
GAZETTEER = [
    "ResNet", "Transformer", "Adam", "CIFAR10", "ImageNet", "BERT",
    "Spark", "Informer", "RoBERTa", "SwinTransformer", "Dropout", "SGD",
]

_SUBJECTS = ["model", "system", "network", "pipeline", "encoder", "module", "agent", "dataset"]
_VERBS = ["is", "has", "contains", "includes", "uses", "implements"]
_OBJECTS = ["fast", "robust", "attention", "layers", "weights", "cache", "memory", "features"]
_FILLER = [
    "the results look promising overall",
    "we report numbers on the validation split",
    "training ran for twelve epochs",
    "see the appendix for details",
    "error bars denote one standard deviation",
]
_LANGS = ["en", "de", "es", "fr", "zh"]

_NAV = '<nav class="top"><a href="/">home</a><a href="/about">about</a><a href="/contact">contact</a></nav>'
_SCRIPT = '<script type="text/javascript">var t=Date.now();console.log("boilerplate",t);</script>'
_STYLE = "<style>body{margin:0}nav{display:flex}footer{color:#888}</style>"
_ASIDE = '<aside class="ads"><div>SUBSCRIBE NOW</div><div>related links</div></aside>'
_FOOTER = "<footer>&copy; synthetic corpus — terms — privacy</footer>"


def _page_text(rng: random.Random, page_id: int) -> str:
    """Deterministic multi-paragraph body with embedded SVO + gazetteer."""
    paras = []
    for _ in range(rng.randint(2, 5)):
        sents = []
        for _ in range(rng.randint(2, 6)):
            kind = rng.random()
            if kind < 0.45:
                sents.append(
                    f"{rng.choice(_SUBJECTS)} {rng.choice(_VERBS)} {rng.choice(_OBJECTS)}"
                )
            elif kind < 0.7:
                sents.append(
                    f"{rng.choice(GAZETTEER)} {rng.choice(_VERBS)} {rng.choice(_OBJECTS)}"
                )
            else:
                sents.append(rng.choice(_FILLER))
        paras.append(". ".join(sents) + ".")
    return "\n\n".join(paras)


def _render_html(text: str, page_id: int, rng: random.Random) -> str:
    body_paras = "".join(f"<p>{p}</p>" for p in text.split("\n\n"))
    title = f"synthetic page {page_id}"
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>{_STYLE}{_SCRIPT}"
        "</head><body>"
        f"{_NAV}{_ASIDE}"
        f'<main><article>{body_paras}</article></main>'
        f"{_FOOTER}"
        "</body></html>"
    )


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Build ``n`` deterministic pages. Pure function of (seed, id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for page_id in pdf["id"]:
                page_id = int(page_id)
                rng = random.Random((seed << 32) | page_id)
                text = _page_text(rng, page_id)
                html = _render_html(text, page_id, rng).encode("utf-8")
                rows.append(
                    {
                        "url": f"https://synthetic.example.org/page/{page_id}",
                        "warc_ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=page_id),
                        "html": html,
                        "text": text,
                        "lang": _LANGS[page_id % len(_LANGS)],
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    num_parts = partitions or max(1, min(256, n // 1000))
    rng_df = spark.range(0, n, numPartitions=num_parts)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)
