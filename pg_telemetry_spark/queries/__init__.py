"""Query modules — importing this package registers every operator.

Each module covers one group of SURVEY.md §2's operator inventory.
"""

from pg_telemetry_spark.queries import (  # noqa: F401
    aggs,
    analytics_ext,
    asof_misc,
    bpe,
    collector_views,
    curation,
    dataeng,
    flagship,
    graph_ops,
    iostat_views,
    joins,
    llm,
    mixture,
    llm_ext,
    nulls,
    patterns,
    relational,
    relstat_views,
    enrich_ext,
    scalars,
    selection_ext,
    sources_sinks,
    sql_surface,
    stats_ext,
    streaming_ops,
    temporal_ext,
    timeseries,
    timeseries_ext,
    tpch_ext,
    udfs,
    windows,
    workload,
)
