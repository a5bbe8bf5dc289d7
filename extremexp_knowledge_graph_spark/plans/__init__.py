"""Materialization plans: triple store, checkpoint manifest, query side."""
