"""Clustered synthetic embeddings for ANN recall measurement
(VERDICT r12 #5).

The fixture embeddings are ISOTROPIC gaussian unit vectors — the
hardest case for uniform-probe recall (there is no structure to find:
every IVF cell boundary cuts through probe neighborhoods at random),
so ANN_RECALL.json's isotropic rows are the bucketing family's FLOOR,
not its quality on real embedding geometry.  Real text/image
embeddings are strongly clustered (topics, languages, modalities);
this tool plants that structure deterministically:

- C = 64 cluster centers, isotropic gaussian, unit-normalized;
- Zipf-skewed mixture weights (p_i ∝ 1/(i+1)) — real corpora have
  hot topics, which means hot IVF cells, the occupancy skew that
  stresses nprobe selection;
- per-vector noise sigma 0.06/dim around the assigned center →
  intra-cluster cosine ≈ 1/(1 + 0.06²·64) ≈ 0.81, inter-cluster
  cosine ≈ the random baseline — separable but not trivial;
- the SAME planted near-copy scheme as the isotropic fixtures (last
  1% = first 1% + 1e-3 noise), so planted_recall@5 stays comparable
  across geometries.

Output: scaledata/emb_clustered_sf{1,10}/embeddings.parquet with the
exact fixture schema (vec_id, embedding list<float32>, label = true
cluster id mod 10).  Row counts mirror scaledata/sf1 (20k) and sf10
(200k).  Seeded rng → byte-identical regeneration.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_scale import _write  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_CLUSTERS = 64
SIGMA = 0.06
DIM = 64


def gen_clustered(out: str, n: int, seed: int = 4213) -> None:
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = 1.0 / np.arange(1, N_CLUSTERS + 1)
    w /= w.sum()
    assign = rng.choice(N_CLUSTERS, size=n, p=w)
    v = centers[assign] + rng.normal(0, SIGMA, (n, DIM))
    n_dup = n // 100
    v[n - n_dup :] = v[:n_dup] + rng.normal(0, 1e-3, (n_dup, DIM))
    assign[n - n_dup :] = assign[:n_dup]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype("float32")
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(v32.reshape(-1), pa.float32()), DIM
    ).cast(pa.list_(pa.float32()))
    os.makedirs(out, exist_ok=True)
    _write(
        os.path.join(out, "embeddings.parquet"),
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": emb,
                "label": pa.array((assign % 10).astype("int32")),
            }
        ),
        2048,
    )


def main() -> None:
    outs = {}
    for tag, n in [("sf1", 20_000), ("sf10", 200_000)]:
        out = os.path.join(REPO, "scaledata", f"emb_clustered_{tag}")
        gen_clustered(out, n)
        outs[tag] = {
            "out": out,
            "rows": n,
            "mb": round(
                os.path.getsize(os.path.join(out, "embeddings.parquet")) / 1e6, 1
            ),
        }
    print(json.dumps(outs))


if __name__ == "__main__":
    main()
