"""Measure layout_zorder's ACTUAL pruning benefit (VERDICT r7 #4).

Writes the same events table twice — time-sorted (the natural ingest
layout) and z-ordered on (user bucket, day) via the same Morton
kernel as the ``layout_zorder`` query — with small parquet row groups,
then audits the footer statistics directly: for a 2-D selective
predicate (a user_id range AND a ts range), count the row groups
whose [min, max] box intersects the predicate under each layout.
That count IS what a parquet reader reads after stats pruning, so
``1 - candidates/total`` is the measured skip ratio — no Spark metric
fishing, no prose.

Also verifies both layouts return identical query results through
Spark with the same predicate.

Usage: python tools/measure_zorder.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import glob
import json
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from pg_telemetry_spark.session import get_session  # noqa: E402

# predicate box: middle ~1/8 of the user range x 4 of 30 days.
# Measured three ways — user-only, ts-only, both — because the value
# proposition of z-order is the FIRST case: a time-sorted layout
# cannot prune a user-only predicate at all (every row group spans
# the full user domain), while the z-layout confines both dims.
U_LO, U_HI = 7000, 8874
T_LO, T_HI = "2024-01-09 00:00:00", "2024-01-12 23:59:59"
U_FULL = (-(1 << 62), 1 << 62)
T_FULL = ("2000-01-01 00:00:00", "2100-01-01 00:00:00")


def zvalue():
    """Morton interleave of (user bucket, day index) — the same
    kernel as queries/asof_misc.py's layout_zorder, built on monotone
    transforms of the two QUERIED columns (user_id, ts) so row-group
    min/max on those raw columns tighten when the file is z-sorted."""
    a = F.shiftright(F.col("user_id"), 6)  # 0..234 for user_id < 15k
    b = F.pmod(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")), F.lit(256)
    )
    z = None
    for k in range(8):
        term = F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k) + F.shiftleft(
            F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1
        )
        z = term if z is None else z + term
    return z


def candidate_row_groups(path: str, u_box, t_box):
    """(candidates, total): row groups whose user_id/ts stats boxes
    intersect the predicate, per parquet footer metadata."""
    import datetime

    import pyarrow.parquet as pq

    u_lo, u_hi = u_box
    t_lo = datetime.datetime.fromisoformat(t_box[0])
    t_hi = datetime.datetime.fromisoformat(t_box[1])
    cand = total = 0
    for fp in sorted(glob.glob(f"{path}/*.parquet")):
        pf = pq.ParquetFile(fp)
        names = [pf.metadata.schema.column(j).name for j in range(pf.metadata.num_columns)]
        ju, jt = names.index("user_id"), names.index("ts")
        for i in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(i)
            su, st = rg.column(ju).statistics, rg.column(jt).statistics
            total += 1
            if (
                su.min <= u_hi
                and su.max >= u_lo
                and st.min <= t_hi
                and st.max >= t_lo
            ):
                cand += 1
    return cand, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "scaledata" / "sf1")
    out_root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="zorder_")
    spark = get_session("measure-zorder")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")

    nat_dir = f"{out_root}/natural"
    z_dir = f"{out_root}/zorder"
    small_groups = {"parquet.block.size": str(512 * 1024)}
    (
        e.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .options(**small_groups)
        .parquet(nat_dir)
    )
    (
        e.withColumn("_z", zvalue())
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .options(**small_groups)
        .parquet(z_dir)
    )

    pred = (
        (F.col("user_id") >= U_LO)
        & (F.col("user_id") <= U_HI)
        & (F.col("ts") >= F.lit(T_LO).cast("timestamp"))
        & (F.col("ts") <= F.lit(T_HI).cast("timestamp"))
    )
    check = []
    for d in (nat_dir, z_dir):
        row = (
            spark.read.parquet(d)
            .filter(pred)
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 4).alias("sv"),
                F.countDistinct("user_id").alias("nu"),
            )
            .collect()[0]
        )
        check.append(tuple(row))
    assert check[0] == check[1], f"layouts disagree under predicate: {check}"

    out = {
        "metric": "zorder_rowgroup_skip",
        "sf_dir": sf_dir,
        "rows_selected_2d": check[0][0],
        "predicates": {},
    }
    for pname, u_box, t_box in (
        ("user_only", (U_LO, U_HI), T_FULL),
        ("ts_only", U_FULL, (T_LO, T_HI)),
        ("both", (U_LO, U_HI), (T_LO, T_HI)),
    ):
        cn, tn = candidate_row_groups(nat_dir, u_box, t_box)
        cz, tz = candidate_row_groups(z_dir, u_box, t_box)
        out["predicates"][pname] = {
            "natural": {"candidates": cn, "total": tn, "skip": round(1 - cn / tn, 4)},
            "zorder": {"candidates": cz, "total": tz, "skip": round(1 - cz / tz, 4)},
            "read_reduction_vs_natural": round(1 - (cz / tz) / (cn / tn), 4),
        }
    print(json.dumps(out))
    spark.stop()
    if len(sys.argv) <= 2:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
