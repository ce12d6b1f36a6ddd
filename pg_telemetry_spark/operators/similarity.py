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
