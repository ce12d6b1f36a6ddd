"""Value-level goldens for the tier-C source/layout queries.

The driver's tier-C record is rows-only (the query executed), so
these pin the VALUES: the corrupt-CSV quarantine must split its
deterministic synthetic batch exactly, and the sortWithinPartitions
layout must verify sorted across every partition without losing rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pg_telemetry_spark.registry import all_queries
from pg_telemetry_spark.tables import load_table

_Q = all_queries()


def test_csv_corrupt_quarantine_exact_split(spark, sf_dir):
    """51 parseable rows (ids 0..49 + id 53), 2 quarantined (wrong
    arity, bad type); parsed score sum = sum(2i, i<50) + 106 = 2556."""
    rows = {r.disposition: r for r in _Q["src_csv_corrupt"].fn(spark, sf_dir).collect()}
    assert rows["good"].n_rows == 51
    assert rows["quarantined"].n_rows == 2
    assert rows["good"].score_sum == sum(2 * i for i in range(50)) + 106


def test_jdbc_seam_descriptor_and_reader_config(spark, sf_dir):
    """No Postgres exists here, so pin the seam itself: every stat
    view appears in the descriptor, partitioned reads carry the 4-knob
    JDBC fan-out config, and the reader is constructible up to
    ``load()`` with those options applied."""
    from pg_telemetry_spark.sources.jdbc_pg import STAT_VIEWS, stat_view_reader

    rows = {r.view: r for r in _Q["src_jdbc_pg"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(STAT_VIEWS)
    for view, part_col in STAT_VIEWS.items():
        assert rows[view].partitioned == (part_col is not None)
        assert rows[view].partition_column == part_col
        # the reader must build without a live DB (options only)
        reader = stat_view_reader(spark, "jdbc:postgresql://db:5432/x", view)
        opts = reader._options if hasattr(reader, "_options") else {}
        if opts:  # private attr may move across Spark versions
            assert opts.get("dbtable") == view


def test_sort_partitions_all_sorted_no_rows_lost(spark, sf_dir):
    out = {r.is_sorted: r for r in _Q["sort_partitions"].fn(spark, sf_dir).collect()}
    assert False not in out, "a partition verified unsorted after sortWithinPartitions"
    n_events = load_table(spark, sf_dir, "events").count()
    assert out[True].n_rows == n_events, "layout pass dropped or duplicated rows"
    assert out[True].n_partitions == 8  # repartition(8) target


def test_manifest_snapshot_time_travel(spark, sf_dir):
    """Golden for snk_manifest_snapshot (tier C): v1 must equal the
    pre-commit source aggregate (time travel — the v2 rewrite cannot
    leak into a v1 read), and v2 must reflect exactly the
    copy-on-write update (split-0 values doubled, split 1 reused)."""
    import pyspark.sql.functions as F

    from pg_telemetry_spark.queries.sources_sinks import snk_manifest_snapshot
    from pg_telemetry_spark.tables import load_table

    rows = {r["version"]: r for r in snk_manifest_snapshot(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    dec = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")
    base = e.agg(
        F.count("*").alias("n"),
        dec(F.col("value")).alias("s"),
        dec(
            F.when(F.pmod("event_id", F.lit(2)) == 0, F.col("value") * 2).otherwise(
                F.col("value")
            )
        ).alias("s2"),
    ).collect()[0]
    assert rows[1]["n_rows"] == base["n"] == rows[2]["n_rows"]
    assert rows[1]["sum_value"] == round(base["s"], 6)
    assert rows[2]["sum_value"] == round(base["s2"], 6)
    assert rows[2]["sum_value"] != rows[1]["sum_value"]


def test_compaction_plan_invariants(spark, sf_dir):
    """layout_compaction (tier C): every partition's plan must honor
    the bin-packing invariants — bins no fewer than the volume lower
    bound ceil(total/target), never more bins than input files, max
    bin within target unless a single file exceeds it, and real
    consolidation (bins < files) whenever more than one file fits the
    target together."""
    import math

    from pg_telemetry_spark.queries.asof_misc import layout_compaction

    target = 4 * 1024 * 1024
    rows = layout_compaction(spark, sf_dir).collect()
    assert rows, "no partitions planned"
    for r in rows:
        lower = max(1, math.ceil(r["total_bytes"] / target))
        assert lower <= r["n_bins"] <= r["n_files"], r
        assert r["max_bin_bytes"] <= max(target, r["total_bytes"]), r
        if r["n_files"] > 1 and r["total_bytes"] <= target:
            assert r["n_bins"] == 1, f"no consolidation: {r}"
