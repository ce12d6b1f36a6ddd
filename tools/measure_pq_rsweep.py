"""Recall-vs-R sweep for llm_ann_pq's exact re-rank shortlist.

The op fixes R=100; ANN_RECALL.json shows recall@10 dipping at sf10
(0.30 isotropic / 0.50 clustered) because the FIXED shortlist shrinks
relative to n.  This tool measures the knob directly — same codebook
training, assignment, and tie-breaks as the op (it imports the op's
own kernels), pure numpy replay, one encode per corpus reused across
every R.  Output: one JSON line per (corpus, R) plus a summary block
appended under the "pq_r_sweep" key of ANN_RECALL.json.

Usage: python tools/measure_pq_rsweep.py [dir ...]
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq  # noqa: E402

from pg_telemetry_spark.queries.llm_ext import _pq_assign, _pq_train  # noqa: E402

OUT = "/root/repo/ANN_RECALL.json"
M, KS, DSUB, NTRAIN, TOPK = 8, 256, 8, 2048, 10
RS = [50, 100, 200, 500, 1000]

DEFAULT = [
    "/root/repo/scaledata/sf10",
    "/root/repo/scaledata/emb_clustered_sf10",
]


def sweep(path: str) -> dict[str, float]:
    t = pq.read_table(f"{path}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    X = np.array(t["embedding"].tolist(), dtype=np.float64)
    books = _pq_train(X[:NTRAIN], m=M, ks=KS, dsub=DSUB)
    q = X[0].reshape(M, DSUB)
    lut = ((books - q[:, None, :]) ** 2).sum(axis=2)
    codes = _pq_assign(X.reshape(len(X), M, DSUB), books)
    adc = np.round(lut[np.arange(M)[None, :], codes].sum(axis=1), 6)
    exact = ((X - X[0]) ** 2).sum(axis=1)
    mask = ids != ids[0]
    mids, madc, mex = ids[mask], adc[mask], exact[mask]
    exact_top = set(mids[np.lexsort((mids, mex))][:TOPK])
    order = np.lexsort((mids, madc))
    out = {}
    # exact-distance lookup must not assume ids are sorted (searchsorted
    # silently maps to wrong rows on any non-ascending vec_id parquet)
    idx_of = {int(i): k for k, i in enumerate(ids)}
    for r in RS:
        short = mids[order][:r]
        se = exact[[idx_of[int(s)] for s in short]]
        rer = set(short[np.lexsort((short, se))][:TOPK])
        out[str(r)] = len(rer & exact_top) / TOPK
        print(
            json.dumps({"corpus": path, "R": r, "recall_at_10": out[str(r)]}),
            flush=True,
        )
    return out


def main() -> None:
    dirs = sys.argv[1:] or DEFAULT
    results = {d: sweep(d) for d in dirs}
    merged = {}
    try:
        merged = json.load(open(OUT))
    except Exception:
        pass
    merged.setdefault("pq_r_sweep", {}).update(results)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
