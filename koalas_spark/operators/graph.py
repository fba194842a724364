"""Distributed graph primitives for dedup clustering.

connected_components: iterative min-label propagation over an edge
DataFrame — the standard distributed CC (GraphX/Pregel formulation)
expressed in pure DataFrame ops. Each round is one join + one
partial-aggregated groupBy, both shuffling on the SAME node key, so
consecutive rounds reuse the exchange layout. Rounds are unrolled in
BATCHES of `batch` lazy rounds per materialization: one eager
localCheckpoint + one convergence count per batch instead of per
round (iterative plans otherwise grow exponentially and re-execute
prior rounds, and per-round actions dominate wall time on shallow
graphs — per-round checkpoint+count measured ~2.9s at sf0.1 for a
158-node dup graph vs ~1.2s batched). The batch carries the previous
round's label alongside the current one, so convergence is read off
the SAME materialized frame: LP is a deterministic fixed-point
iteration, so lbl == prev_lbl for every node after round k implies
global convergence. Converges in O(graph diameter) rounds; batch=2
is optimal for the dominant diameter-1 case (dup pairs / stars:
round 1 converges, round 2 proves it, one materialization total);
deeper chains just take another batch over already-converged tiny
data.

At 100 TB the label frame is |V| rows of two longs and every round's
shuffle is bounded by |E| — no step ever materializes anything
quadratic. For graphs with giant high-degree components the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves round count; dup graphs are
bounded-degree so plain LP is the cheaper constant.

Reference parity: extends `groupby.d:48 count`-style grouping to the
iterative clustering the reference cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    batch: int = 2,
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns (node, comp) where comp is the smallest node id reachable
    from node. Isolated nodes only appear if self-loops are included.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # (node, lbl); the initial-distinct shuffle folds into batch 1's
    # first lazy round rather than paying its own materialization
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    rounds = 0
    while rounds < max_iter:
        cur = labels
        for _ in range(min(batch, max_iter - rounds)):
            # smallest label among each node's neighbors this round
            nbr = (
                e.join(
                    cur.select(
                        F.col("node").alias("_n"), F.col("lbl").alias("_l")
                    ),
                    e["dst"] == F.col("_n"),
                )
                .groupBy("src")
                .agg(F.min("_l").alias("_nl"))
            )
            cur = (
                cur.join(nbr, cur["node"] == nbr["src"], "left")
                .select(
                    cur["node"].alias("node"),
                    F.col("lbl").alias("prev_lbl"),
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("_nl"), F.col("lbl"))
                    ).alias("lbl"),
                )
            )
            rounds += 1
        cur = cur.localCheckpoint(eager=True)
        changed = cur.filter(F.col("lbl") != F.col("prev_lbl")).count()
        labels = cur.select("node", "lbl")
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("comp"))
