"""layout_zorder's measured benefit (VERDICT r7 #4): the z-ordered
layout must actually change what parquet footer stats can prune.

Pins the three-way property tools/measure_zorder.py measures at sf1:
a time-sorted layout prunes NOTHING for a user-only predicate (every
row group spans the full user domain), the z-layout prunes most of
it, and on the 2-D box the z-layout reads no more than the time sort.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pyspark.sql.functions as F

_REPO = Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location(
    "measure_zorder", _REPO / "tools" / "measure_zorder.py"
)
_mz = importlib.util.module_from_spec(_spec)
sys.modules["measure_zorder"] = _mz
_spec.loader.exec_module(_mz)

# sf0.1 events: user_id 0..1499, 30 days — middle ~1/8 user box,
# 4-day ts box (same shape as the sf1 tool run)
U_BOX = (700, 887)
T_BOX = ("2024-01-09 00:00:00", "2024-01-12 23:59:59")
U_FULL = _mz.U_FULL
T_FULL = _mz.T_FULL


def test_zorder_layout_changes_rowgroup_prunability(spark, tmp_path):
    # sf0.1, not the conftest sf0.01: the 0..1499 user range is what
    # gives the >>6 z-bucketing (and the U_BOX constants) resolution
    e = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    # 64 KB blocks -> ~85 row groups over the sf0.1 events table (the
    # parquet writer's size check makes larger settings collapse to a
    # handful of groups at this data volume)
    opts = {"parquet.block.size": str(64 * 1024)}
    nat_dir, z_dir = str(tmp_path / "nat"), str(tmp_path / "z")
    (
        e.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite").options(**opts).parquet(nat_dir)
    )
    (
        e.withColumn("_z", _mz.zvalue())
        .repartitionByRange(4, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").options(**opts).parquet(z_dir)
    )

    # layouts hold the same data
    n_nat = spark.read.parquet(nat_dir).count()
    assert n_nat == spark.read.parquet(z_dir).count() == e.count()

    cn_u, tn = _mz.candidate_row_groups(nat_dir, U_BOX, T_FULL)
    cz_u, tz = _mz.candidate_row_groups(z_dir, U_BOX, T_FULL)
    assert tn > 8 and tz > 8, f"too few row groups to be meaningful: {tn}/{tz}"
    # time sort cannot prune a user-only predicate at all
    assert cn_u == tn, f"time-sorted layout unexpectedly pruned: {cn_u}/{tn}"
    # the z layout prunes most of it
    assert cz_u / tz <= 0.5, f"z layout pruned too little: {cz_u}/{tz}"

    cn_2d, _ = _mz.candidate_row_groups(nat_dir, U_BOX, T_BOX)
    cz_2d, _ = _mz.candidate_row_groups(z_dir, U_BOX, T_BOX)
    assert cz_2d / tz <= cn_2d / tn, (
        f"z layout reads more of the 2-D box than time sort: "
        f"{cz_2d}/{tz} vs {cn_2d}/{tn}"
    )
