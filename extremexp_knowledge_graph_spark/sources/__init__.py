"""Batch sources and deterministic synthetic-data generators."""
