"""Dataflow operators of the KG-construction engine."""
