"""Structured Streaming ingestion — the reference's actual job shape:
file-stream sources, watermarked windowed aggregation, streaming
dedup, arbitrary stateful processing, stream-static enrichment, and
idempotent foreachBatch warehouse sinks with checkpointing.
"""
