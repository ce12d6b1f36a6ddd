"""Connected components over an edge list — the cluster step that
turns near-dup PAIRS into dedup GROUPS (keep one doc per component).

Min-label propagation: every node starts labeled with its own id;
each round a node adopts the minimum label among itself and its
neighbors; fixpoint = components labeled by their minimum member.
Each round is one equi-join + one hash aggregate — no driver-side
graph, so it scales with the cluster.  Rounds needed = graph
diameter; near-dup clusters are shallow (a dup of a dup of a dup),
so 3–5 rounds close virtually all real corpora.  The loop
materializes each round (persist + count) and unpersists the
previous one, keeping lineage flat; on a real cluster swap the
persist for checkpoint() against a fault-tolerant dir.

For adversarial long-chain graphs, the literature answer is
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which converges in O(log n) rounds with the
same join-agg building blocks; the simple propagation here is the
right trade for dedup-shaped graphs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """(id, comp) for every node in ``edges``; ``comp`` = min node id
    reachable from ``id``.  Deterministic; raises if ``max_iter``
    rounds don't reach the fixpoint."""
    und = edges.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .persist()
    )
    # monotone convergence witness: sum of labels strictly decreases
    # until fixpoint (labels only ever shrink toward the component min)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        neigh = sym.join(labels, sym.dst == labels.id).groupBy("src").agg(
            F.min("comp").alias("nb_min")
        )
        # localCheckpoint truncates the lineage so the result plan is
        # one scan of the final labels, not iter-many stacked joins
        # (on a cluster use checkpoint() against a fault-tolerant dir)
        new_labels = (
            labels.join(neigh, labels.id == neigh.src, "left")
            .select(
                labels.id,
                F.least(
                    F.col("comp"), F.coalesce(F.col("nb_min"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
