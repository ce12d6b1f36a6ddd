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
    never shuffles for scoring.

    The rank is SALTED two-phase: a single window over probe_id alone
    collapses parallelism to n_probes partitions — at the sf10 ladder
    that was 10 tasks each sorting 2M scored rows (measured 45 s,
    ×36 on ×10 data).  Phase 1 ranks within (probe, salt-of-neighbor)
    — corpus-partition-wide parallelism, each task sorting n/S rows —
    and keeps k per salt; phase 2 re-ranks the S×k survivors per
    probe, a few-hundred-row sort.  The global top-k is a subset of
    the union of salted top-ks, so the result is exactly the
    single-window answer, tie-breaks included."""
    n_salts = 32
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
    order = (F.col("sim").desc(), F.col("neighbor_id"))
    # Salt on xxhash64(neighbor_id) (not neighbor_id % S): type-
    # agnostic — string id columns work — and uniform even when ids
    # are strided or clustered.
    w1 = Window.partitionBy(
        probe_id_col, F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(n_salts))
    ).orderBy(*order)
    survivors = (
        sims.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    w2 = Window.partitionBy(probe_id_col).orderBy(*order)
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


#: Coarse-pass margin for the two-stage kernel.  The float32 sgemm's
#: worst-case error vs the float64 reference dot is d·eps32 ≈ 64 ×
#: 1.2e-7 ≈ 8e-6 for 64-dim unit vectors (inputs are float32 parquet
#: values, so float32 holds them EXACTLY — only accumulation rounds);
#: 1e-3 leaves a >100x safety factor on top of the 6-decimal rounding
#: downstream, so the coarse mask provably never drops a qualifying
#: pair: recall is 1.0 by construction at every scale, not by tuning.
_COARSE_MARGIN = 1e-3


def _packed_grid(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    num_blocks: int | None,
):
    """Shared block-outer-product scaffolding for the dense kernels:
    hash-partition rows into B blocks, pack each block as (ids, flat
    float32 vector buffer) — the split happens JVM-side via
    array_sort + transform + flatten, so the Python kernel receives
    TWO contiguous Arrow buffers per block instead of n nested
    structs (the per-row dict unpack dominated the old kernel's
    profile) — and join the B-row table with itself on lb <= rb, the
    upper-triangular grid with the small side broadcast.

    Vectors are packed as FLOAT32: the parquet source is float32, so
    nothing is lost, the Arrow transfer and broadcast halve, and the
    coarse sgemm runs at twice the dgemm bandwidth.  Exact float64
    math happens only in the verify stage on gathered candidates.
    """
    import math

    if num_blocks is None:
        n = corpus.count()
        num_blocks = max(8, math.ceil(n / 4096))

    rows = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(id_col).cast("long").alias("bid"),
                F.col(vec_col).cast("array<float>").alias("bvec"),
            )
        )
    )
    packed = (
        corpus.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("b"),
            id_col,
            vec_col,
        )
        .groupBy("b")
        .agg(rows.alias("rows"))
        .select(
            "b",
            F.transform("rows", lambda r: r["bid"]).alias("ids"),
            F.flatten(F.transform("rows", lambda r: r["bvec"])).alias("flat"),
        )
    )
    grid = packed.select(
        F.col("b").alias("lb"),
        F.col("ids").alias("lids"),
        F.col("flat").alias("lflat"),
    ).join(
        # broadcast the B-row right side: the upper-triangular grid
        # is a deliberate tiny nested-loop over B packed rows,
        # never a cartesian over raw table data
        F.broadcast(
            packed.select(
                F.col("b").alias("rb"),
                F.col("ids").alias("rids"),
                F.col("flat").alias("rflat"),
            )
        ),
        F.col("lb") <= F.col("rb"),
    )
    return grid


def _unpack_cell(row):
    import numpy as np

    lids = np.asarray(row["lids"], dtype="int64")
    rids = np.asarray(row["rids"], dtype="int64")
    l32 = np.asarray(row["lflat"], dtype="float32").reshape(len(lids), -1)
    r32 = np.asarray(row["rflat"], dtype="float32").reshape(len(rids), -1)
    return lids, rids, l32, r32


def _cell_candidates(row, threshold: float):
    """Two-stage exact threshold scan of one grid cell: float32 sgemm
    coarse pass (mask at threshold - _COARSE_MARGIN, never a full-
    matrix round), float64 re-dot of the gathered candidates, final
    filter on round(sim64, 6) >= threshold — bit-for-bit the old
    full-dgemm semantics at ~half the memory traffic."""
    import numpy as np

    lids, rids, l32, r32 = _unpack_cell(row)
    sims32 = l32 @ r32.T  # one BLAS sgemm per grid cell
    li, ri = np.nonzero(sims32 >= threshold - _COARSE_MARGIN)
    if row["lb"] == row["rb"]:
        keep = lids[li] < rids[ri]
        li, ri = li[keep], ri[keep]
    s64 = np.einsum(
        "ij,ij->i", l32[li].astype("float64"), r32[ri].astype("float64")
    )
    s = np.round(s64, 6)
    ok = s >= threshold
    return lids[li[ok]], rids[ri[ok]], s[ok]


def sim_join_blockwise(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int | None = None,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via a distributed block-matrix
    product — no table data ever touches the driver.

    Dense all-pairs similarity is linear algebra, so each block pair
    multiplies as one BLAS gemm instead of per-element Catalyst
    lambda evaluation over exploded pairs (measured 14.6 s ->
    sub-second at sf0.1).  The kernel is TWO-STAGE EXACT (round 12):
    a float32 sgemm coarse pass masks candidates at threshold -
    _COARSE_MARGIN, and only those (~0.3% of cells' pairs at the
    fixture threshold) are re-dotted in float64 and rounded — see
    _COARSE_MARGIN for the proof the mask can never drop a qualifying
    pair.  Outputs are identical to the one-stage float64 kernel
    (oracle-pinned at the gate scale), at roughly half the memory
    traffic and none of the old full-matrix np.round cost; measured
    sf10 (200k vectors): 82 s -> see BASELINE.md round 12.

    Scale: executor memory bounds ONE GRID CELL — an (n/B)×(n/B)
    float32 similarity matrix — so B GROWS with the corpus (blocks
    capped at ~4096 rows => cells ≤67 MB whatever the corpus; the
    B-row packed side is broadcast once, ~0.25 GB per 10⁶ 64-d
    float32 vectors).  Note the OUTPUT of this operator is inherently
    Θ(n²) on iid corpora (a fixed sim threshold admits a fixed
    fraction of all pairs), so the all-pairs flop count is not
    avoidable overhead — the sub-quadratic family for when the
    corpus outgrows this is LSH/IVF candidate blocking
    (operators/minhash.py, operators/ann.py).
    """
    import pandas as pd

    grid = _packed_grid(corpus, id_col, vec_col, num_blocks)

    def block(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                a, b, s = _cell_candidates(row, threshold)
                import numpy as np

                yield pd.DataFrame(
                    {"id1": np.minimum(a, b), "id2": np.maximum(a, b), "sim": s}
                )

    return grid.mapInPandas(block, "id1 bigint, id2 bigint, sim double")


def sim_join_neighbor_stats(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int | None = None,
) -> DataFrame:
    """(id, min_neighbor, n_neighbors) over the cosine-≥-threshold
    graph, with the neighbor aggregation PUSHED INTO the block kernel
    (map-side combine for the dense sim join): each grid cell emits at
    most 2×block_size partial rows — (id, min partner, count) per
    side — instead of every qualifying pair.  At the sf10 ladder the
    pair stream is ~26M rows before the explode a consumer like
    embed-dedup needs (~52M shuffled); partials cap at ~10M and skip
    the explode entirely, exactly the partial-aggregation pattern a
    groupBy gets for free from Catalyst but a mapInPandas kernel must
    implement itself.  Same two-stage exact candidate scan as
    sim_join_blockwise, so downstream results are identical."""
    import pandas as pd

    grid = _packed_grid(corpus, id_col, vec_col, num_blocks)

    def block(batches):
        import numpy as np

        for pdf in batches:
            for _, row in pdf.iterrows():
                a, b, _s = _cell_candidates(row, threshold)
                ids = np.concatenate([a, b])
                partners = np.concatenate([b, a])
                if len(ids) == 0:
                    continue
                # group min(partner), count per id — np.unique gives
                # the group index; minimum.at does the scatter-min
                uids, inv = np.unique(ids, return_inverse=True)
                mins = np.full(len(uids), np.iinfo(np.int64).max, dtype="int64")
                np.minimum.at(mins, inv, partners)
                cnts = np.bincount(inv, minlength=len(uids)).astype("int64")
                yield pd.DataFrame(
                    {"id": uids, "min_nb": mins, "cnt": cnts}
                )

    partials = grid.mapInPandas(block, "id bigint, min_nb bigint, cnt bigint")
    return partials.groupBy("id").agg(
        F.min("min_nb").alias("min_nb"), F.sum("cnt").alias("n_neighbors")
    )
