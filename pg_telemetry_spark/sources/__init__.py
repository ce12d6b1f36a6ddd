"""Ingest sources: fixture Parquet, CSV/JSON secondary formats, the
JDBC Postgres stat-view seam, and streaming file sources.
"""
