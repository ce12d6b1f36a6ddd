"""Dump .explain("formatted") evidence for the round-16 optimization
targets into plans/r16/<query>_<tag>.txt.

Usage: python tools/gen_r16_plans.py <tag>     # tag = before|after

Lazy queries dump their returned frame's plan.  The iterative ops
(whose registered query returns a materialized/driver-assembled frame)
dump the REPRESENTATIVE ROUND plan instead — the join+aggregate one
round executes — because that is where the round-16 changes live
(broadcast vs shuffle join, exchange count per round).

Run with the table cache ON (the executed path) at sf0.01; the plan
text is independent of the scale factor.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = Path(os.environ.get("SPARK_GRAFT_PLANS_OUT", REPO / "plans" / "r16"))
OUT.mkdir(parents=True, exist_ok=True)
SF = "/root/testdata/sf0.01"

import pyspark.sql.functions as F  # noqa: E402

from pg_telemetry_spark.session import get_session  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump(name: str, df) -> None:
    path = OUT / f"{name}_{TAG}.txt"
    path.write_text(plan_text(df))
    print("wrote", path)


def main() -> None:
    spark = get_session("gen-r16-plans")
    from pg_telemetry_spark.cache import release_pinned
    from pg_telemetry_spark.registry import all_queries

    reg = all_queries()

    # lazy queries: returned-frame plans
    for name in [
        "ts_theilsen",
        "llm_simhash",
        "llm_band_tuning",
        "wl_copurchase_degree",
        "wl_copurchase_triangles",
        "wl_link_prediction",
        "wl_kcore",
        "llm_dedup_incr",
        "llm_ann_incr",
    ]:
        release_pinned()
        dump(name, reg[name].fn(spark, SF))

    # iterative ops: representative ROUND plan (the loop body one
    # round executes), built exactly as the query builds it — for the
    # after-tree, under the loop's actual runtime confs (sized
    # shuffle, AQE off) so the dump matches execution
    if TAG == "after":
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    from pg_telemetry_spark.queries.graph_ops import (
        _month_items,
        copurchase_edges,
    )

    e = copurchase_edges(_month_items(spark, SF))
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    n_v = sym.select("u").distinct().count()
    ranks = deg.select("u", F.lit(1.0 / n_v).alias("rank")).localCheckpoint()
    edges_deg = sym.join(deg, "u").persist()
    try:
        from pg_telemetry_spark.queries.graph_ops import _vertex_side

        rank_side = _vertex_side(ranks, n_v)
    except ImportError:  # before-tree: no broadcast gate
        rank_side = ranks
    contribs = (
        edges_deg.join(rank_side, "u")
        .select(F.col("v").alias("u"), (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("u")
        .agg(F.sum("c").alias("inflow"))
    )
    dump("wl_pagerank_round", contribs)

    labels = sym.select("u").distinct().select("u", F.col("u").alias("label"))
    lab = labels.select(F.col("u").alias("v"), "label")
    try:
        from pg_telemetry_spark.queries.graph_ops import _vertex_side

        lab = _vertex_side(lab, n_v)
    except ImportError:
        pass
    nbr = sym.join(lab, "v").select("u", "label")
    cnt = nbr.groupBy("u", "label").agg(F.count("*").alias("c"))
    dump("wl_label_propagation_round", cnt)

    frontier = labels.select("u").limit(1).localCheckpoint()
    visited = frontier.localCheckpoint()
    fr = frontier
    vi = visited
    try:
        from pg_telemetry_spark.queries.graph_ops import _vertex_side

        fr = _vertex_side(frontier, n_v)
        vi = _vertex_side(visited, n_v)
    except ImportError:
        pass
    nxt = (
        sym.join(fr, "u", "left_semi")
        .select(F.col("v").alias("u"))
        .distinct()
        .join(vi, "u", "left_anti")
    )
    dump("wl_bfs_hops_hop", nxt)

    spark.stop()


if __name__ == "__main__":
    main()
