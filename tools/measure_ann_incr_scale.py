"""Measure the O(delta) claim of the materialized ANN index (VERDICT
r14 #2, the llm_dedup_incr/measure_incr_scale template): probe the
SAME 10-vector delta against a 1x and a 10x Parquet-materialized
index — if the per-batch cost is O(delta + candidates), the probe
wall must stay near-flat while the index grows 10x (the residual
growth is the broadcast-join STREAM scan of the bigger index, which
is partition-pruned storage-side at warehouse scale where the index
is partitioned on (tbl, bucket)).

Both the isotropic and the clustered geometry ladders run: clustered
is the geometry whose hot buckets the r15 refinement split bounds, so
its candidate volume (the O(candidates) term) is the interesting one.

Usage: python tools/measure_ann_incr_scale.py
Writes one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from pg_telemetry_spark.operators.ann import (  # noqa: E402
    REF_BITS,
    _hyperplanes,
    _ref_hyperplanes,
    build_lsh_ann_index,
    estimate_neighbor_cos,
    lsh_ann_index_delta,
    lsh_ann_probe,
    lsh_plan,
)
from pg_telemetry_spark.session import get_session  # noqa: E402

LADDERS = {
    "isotropic": [
        ("sf1", "/root/repo/scaledata/sf1/embeddings.parquet"),
        ("sf10", "/root/repo/scaledata/sf10/embeddings.parquet"),
    ],
    "clustered": [
        ("sf1", "/root/repo/scaledata/emb_clustered_sf1/embeddings.parquet"),
        ("sf10", "/root/repo/scaledata/emb_clustered_sf10/embeddings.parquet"),
    ],
}


def main() -> None:
    spark = get_session("measure-ann-incr")
    out = {"metric": "ann_incr_probe_scale", "delta_vectors": 10, "ladders": {}}
    for geom, legs in LADDERS.items():
        gl = {}
        for label, path in legs:
            emb = spark.read.parquet(path).select("vec_id", "embedding")
            corpus = emb.filter(F.col("vec_id") >= 10)
            delta = emb.filter(F.col("vec_id") < 10)
            n = corpus.count()
            s_k = estimate_neighbor_cos(corpus)
            nbits, tables, _, _ = lsh_plan(n, s_k)
            planes = [_hyperplanes(nbits, 64, seed=t) for t in range(tables)]
            ref_planes = _ref_hyperplanes(tables, REF_BITS, 64)
            base = f"/tmp/ann_incr_scale/{geom}_{label}"
            t0 = time.perf_counter()
            index, hot = build_lsh_ann_index(corpus, planes, ref_planes, n=n)
            index.write.mode("overwrite").parquet(f"{base}/index")
            hot.write.mode("overwrite").parquet(f"{base}/hot")
            corpus.write.mode("overwrite").parquet(f"{base}/vectors")
            t_build = time.perf_counter() - t0
            idx = spark.read.parquet(f"{base}/index")
            hotd = spark.read.parquet(f"{base}/hot")
            vecs = spark.read.parquet(f"{base}/vectors")
            probes = delta.select(F.col("vec_id").alias("probe_id"), "embedding")
            # one untimed probe pre-pays plan compilation (the same
            # steady-state accounting bench.py uses for the incr ops);
            # the cold number is recorded too.
            t0 = time.perf_counter()
            lsh_ann_probe(idx, hotd, probes, planes, ref_planes, vecs, k=5).collect()
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = lsh_ann_probe(
                idx, hotd, probes, planes, ref_planes, vecs, k=5
            ).collect()
            t_probe = time.perf_counter() - t0
            t0 = time.perf_counter()
            lsh_ann_index_delta(delta, planes, ref_planes, hotd).write.mode(
                "overwrite"
            ).parquet(f"{base}/delta_rows")
            t_maint = time.perf_counter() - t0
            gl[label] = {
                "corpus_vectors": n,
                "index_rows": n * tables,
                "nbits": nbits,
                "tables": tables,
                "build_sec": round(t_build, 2),
                "probe_cold_sec": round(t_cold, 2),
                "probe_sec": round(t_probe, 2),
                "maintain_sec": round(t_maint, 2),
                "topk_rows": len(rows),
            }
        gl["probe_ratio_10x_index"] = round(
            gl["sf10"]["probe_sec"] / max(gl["sf1"]["probe_sec"], 1e-9), 2
        )
        out["ladders"][geom] = gl
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
