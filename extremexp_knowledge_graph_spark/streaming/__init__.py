"""Structured Streaming ingestion — the file-watcher replacement."""
