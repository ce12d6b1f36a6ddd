"""pg_telemetry_spark — a PySpark-native telemetry/analytics engine.

A brand-new engine with the query and data-processing capabilities of
the ``FRiMN/pg_telemetry`` class of systems (Postgres -> ClickHouse
telemetry pipelines): Structured Streaming ingestion, a partitioned
columnar warehouse layout, the full time-series query surface
(counter deltas/rates, time buckets, sessions, last-point, gap-fill),
a complete relational operator set, and LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis).

Everything is idiomatic Spark DataFrame/SQL — declarative plans that
Catalyst/Tungsten optimize — designed for 100 TB scale even though the
test harness runs on local fixtures. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from pg_telemetry_spark.session import get_session, prepare_session
from pg_telemetry_spark.tables import load_tables, TABLE_NAMES

__all__ = ["get_session", "prepare_session", "load_tables", "TABLE_NAMES"]
