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
quadratic. For graphs with long chains or giant components the
alternating large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond") converges in
O(log^2 n) rounds instead of O(diameter) — select it with
``algorithm="star"``. Dup graphs are shallow bounded-degree stars,
so plain LP stays the default (cheaper constant per round).

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
    algorithm: str = "lp",
    driver_edge_limit: int = 1_000_000,
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns (node, comp) where comp is the smallest node id reachable
    from node. Isolated nodes only appear if self-loops are included.

    Size-adaptive, the same way AQE picks join strategies at runtime:
    the edge list is materialized once (a checkpoint the iterative
    paths need anyway) and counted; at or under ``driver_edge_limit``
    edges (default 1M ≈ 16 MB of longs — broadcast-threshold-scale
    driver state, NOT proportional to the corpus) a driver-side
    union-find answers in one collect instead of paying 2-3 distributed
    fixed-point rounds, each a checkpoint + convergence action. Dedup
    graphs after pair verification are usually far below the gate even
    when the corpus is 100 TB — dup EDGES are the rare survivors of a
    verified near-dup test — while a graph above it takes the
    distributed path untouched. Pass ``driver_edge_limit=0`` to force
    the distributed path (tests exercise both).

    algorithm="lp" (default): min-label propagation, O(diameter)
    rounds — the right constant for shallow dup graphs.
    algorithm="star": alternating large-star/small-star, O(log^2 n)
    rounds — use when components may be deep (long chains) or huge.
    """
    if algorithm not in ("lp", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if driver_edge_limit > 0:
        raw = raw.localCheckpoint(eager=True)
        if raw.count() <= driver_edge_limit:
            return _driver_components(raw)
    if algorithm == "star":
        return _star_components(raw, "src", "dst", max_iter)
    e = (
        raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
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


def _driver_components(edges: DataFrame) -> DataFrame:
    """Union-find over a small, already-materialized edge list.

    Only reached under the ``driver_edge_limit`` gate, so the collect
    is bounded (≤ limit rows of two longs) regardless of corpus size —
    the same bounded-driver-state argument as broadcast joins. Output
    matches the distributed paths exactly: (node, comp) with comp the
    component minimum, one row per node that appears in an edge."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in edges.collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the invariant comp == component min
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    rows = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(rows, "node long, comp long")


def _star_components(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al. 2014).

    Each round rewires edges toward per-neighborhood minima:

      large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u),
        v > u — strictly larger neighbors hook onto u's minimum.
      small-star(u): over Ns = {v ∈ N(u): v < u}, m = min(Ns); emit
        (v, m) for v ∈ Ns \\ {m} and (u, m) — u and its smaller
        neighbors collapse onto the smallest.

    Both phases are one groupBy(min) + one join, each shuffling on
    the SAME node key, and the edge set never grows beyond |E|. At
    the fixed point every component is a star rooted at its minimum
    id, so the answer is read off the final edge list with one
    aggregation — no separate label frame to iterate.

    Convergence is detected with a deterministic one-scan signature
    (count, bit_xor(xxhash64(u, v))) on the canonical (undirected,
    distinct) edge set — XOR over 64-bit hashes of a SET is an
    order-insensitive, overflow-free identity (sums overflow under
    ANSI mode); two rounds agreeing on it means the edge set reached
    the fixed point.
    """
    # canonical undirected edge list, smaller id first; self-loops
    # (used by callers to force isolated nodes into the output) are
    # carried through as (n, n)
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        canon.select(F.col("u").alias("node"))
        .union(canon.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)),
            F.bit_xor(F.xxhash64("u", "v")),
        ).collect()[0]
        return tuple(row)

    sig = _sig(canon)
    for _ in range(max_iter):
        sym = canon.select("u", "v").union(
            canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: strictly larger neighbors of u hook to
        # m(u) = min(N(u) ∪ {u})
        lmins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least(F.col("v"), F.col("m")).alias("u"),
                F.greatest(F.col("v"), F.col("m")).alias("v"),
            )
        )
        lsym = large.select("u", "v").union(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # small-star: u and its strictly smaller neighbors collapse
        # onto the smallest of them
        small_n = lsym.filter(F.col("v") < F.col("u"))
        smins = small_n.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            small_n.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least(F.col("a"), F.col("b")).alias("u"),
                F.greatest(F.col("a"), F.col("b")).alias("v"),
            )
        )
        # keep self-loops alive so isolated nodes stay representable
        loops = canon.filter(F.col("u") == F.col("v"))
        canon = small.union(loops).distinct().localCheckpoint(eager=True)
        new_sig = _sig(canon)
        if new_sig == sig:
            break
        sig = new_sig
    # fixed point: non-root nodes appear as v of exactly one star
    # edge (u=root); roots and isolated nodes fall back to themselves
    parents = (
        canon.filter(F.col("u") != F.col("v"))
        .groupBy(F.col("v").alias("node"))
        .agg(F.min("u").alias("parent"))
    )
    return nodes.join(parents, "node", "left").select(
        "node", F.coalesce("parent", "node").alias("comp")
    )
