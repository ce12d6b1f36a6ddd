"""Mergeable t-digest quantile sketch (Dunning & Ertl 2019).

The sketch the reference class of systems ships for percentile
rollups: per-partition digests built map-side, merged associatively
per group, quantiles interpolated from the merged centroids.  Unlike
``approx_percentile`` the digest itself is a first-class value here —
the point is the MERGEABILITY: at 100 TB the digest table is a
per-(group, day) rollup artifact that re-aggregates to any coarser
grain without touching raw data, the same pattern as agg_hll_rollup.

Numpy implementation of the MERGING digest with the k1 scale
function: a batch of (mean, weight) centroids is sorted by mean and
greedily coalesced while the potential k1(q_right) - k1(q_left) <= 1,
which bounds centroid count by ~2*ceil(delta) and keeps accuracy
~q(1-q)/delta near the tails.  Deterministic: sorting ties break on
index order, accumulation is left-to-right — same input, same
digest, on any executor.

Accuracy is pinned by tests/test_units_tdigest.py: rank error vs the
exact quantile on planted distributions <= 0.01 at delta=200.
"""

from __future__ import annotations

import numpy as np

DELTA = 200.0


def _k1(q: np.ndarray | float, delta: float = DELTA) -> np.ndarray | float:
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def merge_centroids(
    means: np.ndarray, weights: np.ndarray, delta: float = DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Coalesce (mean, weight) centroids into a size-bounded digest.

    Sort by mean (stable), then greedily merge adjacent centroids
    while the k1 potential span of the merged cluster stays <= 1.
    Works for raw values (weight 1 each) and for merging digests —
    the same kernel serves build and reduce, which is what makes the
    sketch associative enough for Spark's two-phase aggregation.
    """
    means = np.asarray(means, dtype="float64")
    weights = np.asarray(weights, dtype="float64")
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    w_before = 0.0  # weight strictly left of the current cluster
    for m, w in zip(means[1:], weights[1:]):
        q_left = w_before / total
        q_right = (w_before + cur_w + w) / total
        if _k1(q_right, delta) - _k1(q_left, delta) <= 1.0:
            # weighted mean update keeps the cluster's centroid exact
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def quantile(
    means: np.ndarray, weights: np.ndarray, qs: list[float]
) -> list[float]:
    """Interpolated quantile estimates from a merged digest.

    Centroid i covers the rank midpoint cum_i = W(<i) + w_i/2;
    estimates interpolate linearly between adjacent midpoints and
    clamp to the extreme centroid means at the tails (the standard
    mid-rank interpolation; singleton tails make min/max exact).
    """
    means = np.asarray(means, dtype="float64")
    weights = np.asarray(weights, dtype="float64")
    if len(means) == 0:
        return [float("nan") for _ in qs]
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2.0
    out = []
    for q in qs:
        r = q * total
        out.append(float(np.interp(r, cum, means)))
    return out
