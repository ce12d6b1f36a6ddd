"""Audit the multi-table LSH cost model: predicted candidate fraction
(lsh_plan's T*(b+1)/2^b, assuming uniform bucket occupancy) vs the
MEASURED distinct-candidate fraction per probe on real corpora —
through the SAME capped index + query-directed probe path the
operator ships (r15: build_lsh_ann_index hot-bucket refinement,
VERDICT r14 #1; the r14 run of this tool measured the UNCAPPED path
at worst-probe ~20% of a clustered corpus vs the 0.64% uniform
prediction).

The declared r15 cap: measured max candidate fraction <= 0.15 on
both clustered corpora at recall within 0.05 of the uncapped
operating point (recall itself is refreshed by measure_ann_recall.py
into the same ANN_RECALL.json).

Prints one JSON line per corpus and merge-updates the `lsh_volume`
section of ANN_RECALL.json.

Usage: python tools/measure_lsh_volume.py [sf_dir ...]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from pg_telemetry_spark.operators.ann import (  # noqa: E402
    REF_BITS,
    SUB_PROBES,
    _hyperplanes,
    _probe_code_rows,
    _ref_hyperplanes,
    build_lsh_ann_index,
    estimate_neighbor_cos,
    hot_bucket_width,
    lsh_plan,
)
from pg_telemetry_spark.session import get_session  # noqa: E402
from pg_telemetry_spark.tables import load_table  # noqa: E402

OUT = "/root/repo/ANN_RECALL.json"

DEFAULT = [
    "/root/testdata/sf0.1",
    "/root/repo/scaledata/sf1",
    "/root/repo/scaledata/sf10",
    "/root/repo/scaledata/emb_clustered_sf1",
    "/root/repo/scaledata/emb_clustered_sf10",
]


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT
    spark = get_session("lsh-volume")
    results: dict[str, dict] = {}
    for sf in dirs:
        emb = load_table(spark, sf, "embeddings")
        n = emb.count()
        s_k = estimate_neighbor_cos(emb)
        nbits, tables, exp_recall, exp_frac = lsh_plan(n, s_k)
        planes = [_hyperplanes(nbits, 64, seed=t) for t in range(tables)]
        ref_planes = _ref_hyperplanes(tables, REF_BITS, 64)
        index, hot = build_lsh_ann_index(emb, planes, ref_planes, n=n)
        index = index.persist()
        index.count()
        hot = hot.persist()
        n_hot = hot.count()
        probes = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        p = _probe_code_rows(probes, planes, ref_planes, SUB_PROBES, "probe_id")
        flips = F.array(F.lit(0), *[F.lit(1 << j) for j in range(nbits)])
        p_buckets = p.withColumn("flip", F.explode(flips)).select(
            "probe_id",
            "tbl",
            F.col("bucket").bitwiseXOR(F.col("flip")).alias("bucket"),
            "subs",
        )
        p_marked = p_buckets.join(
            F.broadcast(hot.withColumn("_hot", F.lit(True))), ["tbl", "bucket"], "left"
        )
        p_idx = p_marked.select(
            "probe_id",
            "tbl",
            "bucket",
            F.explode(
                F.when(F.col("_hot"), F.col("subs")).otherwise(
                    F.array(F.lit(-1).cast("long"))
                )
            ).alias("sub"),
        )
        cand = (
            index.join(F.broadcast(p_idx), ["tbl", "bucket", "sub"])
            .filter(F.col("id") != F.col("probe_id"))
            .select("probe_id", "id")
        )
        per_probe = (
            cand.distinct()
            .groupBy("probe_id")
            .agg(F.count("*").alias("n_cand"))
            .agg(F.avg("n_cand").alias("avg"), F.max("n_cand").alias("mx"))
            .head()
        )
        # a degenerate corpus can yield ZERO candidate pairs, in which
        # case avg/max aggregate to None (ADVICE r14) — report 0.0
        # instead of aborting the whole sweep on a TypeError
        avg = per_probe["avg"] if per_probe["avg"] is not None else 0.0
        mx = per_probe["mx"] if per_probe["mx"] is not None else 0
        row = {
            "n": n,
            "s_k": s_k,
            "nbits": nbits,
            "tables": tables,
            "hot_width": hot_bucket_width(n),
            "hot_buckets": n_hot,
            "predicted_frac": exp_frac,
            "measured_avg_frac": round(avg / max(1, n - 1), 4),
            "measured_max_frac": round(mx / max(1, n - 1), 4),
        }
        results[sf] = row
        print(json.dumps({"corpus": sf, **row}), flush=True)
        index.unpersist()
        hot.unpersist()
    merged: dict = {}
    try:
        merged = json.load(open(OUT))
    except Exception:
        pass
    merged.setdefault("lsh_volume", {}).update(results)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
