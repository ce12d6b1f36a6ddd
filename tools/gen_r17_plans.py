"""Dump .explain("formatted") evidence for the round-17 optimization
targets into plans/r17/<query>_<tag>.txt.

Usage: python tools/gen_r17_plans.py <tag>     # tag = before|after

Same protocol as tools/gen_r16_plans.py: lazy queries dump their
returned frame's plan; iterative ops dump the REPRESENTATIVE ROUND
plan (built exactly as the loop builds it, under the loop's actual
runtime confs).  The script runs unchanged on the round-open tree
(3d4bddf) for the before-dumps — engine symbols that only exist after
the r17 edits are imported defensively.

Run with the table cache ON (the executed path) at sf0.01; plan text
is scale-independent.
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
OUT = Path(os.environ.get("SPARK_GRAFT_PLANS_OUT", REPO / "plans" / "r17"))
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
    spark = get_session("gen-r17-plans")
    from pg_telemetry_spark.cache import release_pinned
    from pg_telemetry_spark.registry import all_queries

    reg = all_queries()

    # lazy queries: returned-frame plans
    for name in [
        "ts_theilsen",
        "wl_copurchase_degree",
        "wl_copurchase_triangles",
        "wl_link_prediction",
        "llm_dedup_incr",
        "llm_ann_incr",
        "llm_dedup_cc",
    ]:
        release_pinned()
        dump(name, reg[name].fn(spark, SF))

    # ---- iterative ops: representative round plans under the loop's
    # actual runtime confs ----
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

    # loop confs: before-tree = constant 8 / AQE off; after-tree =
    # derived width (identical at this SF, proven by the dump)
    try:
        from pg_telemetry_spark.session import loop_shuffle_width

        width = loop_shuffle_width(spark, n_v)
    except ImportError:
        width = 8
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    from pg_telemetry_spark.queries.graph_ops import _vertex_side

    ranks = deg.select("u", F.lit(1.0 / n_v).alias("rank")).localCheckpoint()
    edges_deg = sym.join(deg, "u").persist()
    contribs = (
        edges_deg.join(_vertex_side(ranks, n_v), "u")
        .select(F.col("v").alias("u"), (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("u")
        .agg(F.sum("c").alias("inflow"))
    )
    dump("wl_pagerank_round", contribs)

    frontier = deg.select("u").limit(1).localCheckpoint()
    visited = frontier.localCheckpoint()
    nxt = (
        sym.join(_vertex_side(frontier, n_v), "u", "left_semi")
        .select(F.col("v").alias("u"))
        .distinct()
        .join(_vertex_side(visited, n_v), "u", "left_anti")
    )
    dump("wl_bfs_hops_hop", nxt)

    # connected-components round (the llm_dedup_cc loop body)
    labels = (
        sym.select(F.col("u").alias("id"), F.col("u").alias("comp"))
        .localCheckpoint()
    )
    cc_sym = sym.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    neigh = cc_sym.join(labels, cc_sym.dst == labels.id).groupBy("src").agg(
        F.min("comp").alias("nb_min")
    )
    new_labels = labels.join(neigh, labels.id == neigh.src, "left").select(
        labels.id,
        F.least(F.col("comp"), F.coalesce(F.col("nb_min"), F.col("comp"))).alias(
            "comp"
        ),
    )
    dump("llm_dedup_cc_round", new_labels)

    # BPE merge round (the pair count one round executes).  Before the
    # r17 change the merge loop ran under the SESSION conf (AQE on) —
    # dump it under the confs it actually ran with per tag.
    if TAG == "before":
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    from pg_telemetry_spark.tables import load_table

    d = load_table(spark, SF, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("wn"))
        .select(F.expr("filter(split(w, ''), s -> s != '')").alias("syms"), "wn")
        .localCheckpoint()
    )
    pc = (
        vocab.filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS a,"
                    "             element_at(syms, i + 1) AS b))"
                )
            ).alias("p"),
            "wn",
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("wn").alias("n"))
    )
    dump("llm_bpe_train_round", pc)

    spark.stop()


if __name__ == "__main__":
    main()
