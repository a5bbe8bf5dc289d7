"""Scalar kernels: native Column expressions + Arrow-batched pandas UDFs."""

from extremexp_knowledge_graph_spark.functions.uri import sanitize_for_uri, entity_uri, paper_uri
from extremexp_knowledge_graph_spark.functions.year import year_from_pdf_url
from extremexp_knowledge_graph_spark.functions.values import parse_metric_value, parse_rank

__all__ = [
    "sanitize_for_uri",
    "entity_uri",
    "paper_uri",
    "year_from_pdf_url",
    "parse_metric_value",
    "parse_rank",
]
