"""connected_components semantics on known graphs."""

from pyspark.sql import functions as F

from koalas_spark.operators.graph import connected_components


def _comps(spark, pairs, driver_edge_limit=0):
    # driver_edge_limit=0 forces the distributed LP path; the
    # size-gated driver union-find is covered by its own tests below
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges, driver_edge_limit=driver_edge_limit).collect()
    got = {}
    for r in rows:
        got.setdefault(r["comp"], set()).add(r["node"])
    return sorted(sorted(v) for v in got.values())


def test_chain_collapses_to_one(spark):
    # 1-2-3-4-5 chain: diameter 4, forces multiple LP rounds
    assert _comps(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == [[1, 2, 3, 4, 5]]


def test_two_components_and_triangle(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11)]
    assert _comps(spark, pairs) == [[1, 2, 3], [10, 11]]


def test_min_label_is_canonical(spark):
    # labels flow down regardless of edge direction given
    pairs = [(9, 4), (4, 7), (100, 9)]
    comps = _comps(spark, pairs)
    assert comps == [[4, 7, 9, 100]]


def test_star_graph_single_round_shape(spark):
    pairs = [(5, i) for i in range(6, 20)]
    assert _comps(spark, pairs) == [list(range(5, 20))]


# ---------------- large-star/small-star variant ----------------


def _comps_star(spark, pairs, max_iter=50):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(
        edges, algorithm="star", max_iter=max_iter, driver_edge_limit=0
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["comp"], set()).add(r["node"])
    return sorted(sorted(v) for v in got.values())


def test_star_algo_matches_lp_on_known_graphs(spark):
    for pairs in (
        [(1, 2), (2, 3), (3, 4), (4, 5)],
        [(1, 2), (2, 3), (1, 3), (10, 11)],
        [(9, 4), (4, 7), (100, 9)],
        [(7, 7), (1, 2)],  # self-loop keeps an isolated node visible
    ):
        assert _comps_star(spark, pairs) == _comps(spark, pairs)


def test_star_algo_high_degree_star_converges_in_two_rounds(spark):
    # degree-10^4 hub (the boilerplate-page dup-graph shape): one
    # alternating round reaches the fixed point, the second proves it
    # — max_iter=2 would raise/diverge if more rounds were needed,
    # so a correct answer here IS the convergence assertion
    pairs = [(0, i) for i in range(1, 10_001)]
    comps = _comps_star(spark, pairs, max_iter=2)
    assert comps == [list(range(0, 10_001))]


def test_star_algo_long_chain_logsq_rounds(spark):
    # 256-node path: diameter 255, so plain LP needs ~255 rounds;
    # alternating star rounds collapse it within 10 (O(log^2 n))
    pairs = [(i, i + 1) for i in range(255)]
    comps = _comps_star(spark, pairs, max_iter=10)
    assert comps == [list(range(0, 256))]


def test_star_algo_random_graphs_match_lp(spark):
    # deterministic pseudo-random edge soup, compared against LP
    pairs = []
    x = 1
    for _ in range(300):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 500
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 500
        if a != b:
            pairs.append((a, b))
    assert _comps_star(spark, pairs) == _comps(spark, pairs)


# ---------------- size-gated driver union-find ----------------


def test_driver_fast_path_matches_distributed(spark):
    for pairs in (
        [(1, 2), (2, 3), (3, 4), (4, 5)],
        [(1, 2), (2, 3), (1, 3), (10, 11)],
        [(9, 4), (4, 7), (100, 9)],
        [(5, i) for i in range(6, 20)],
        [(7, 7), (1, 2)],
    ):
        fast = _comps(spark, pairs, driver_edge_limit=1_000_000)
        assert fast == _comps(spark, pairs, driver_edge_limit=0)


def test_driver_gate_respects_limit(spark):
    # 10 edges, limit 5 -> must take the distributed path and still be
    # correct (i.e. the gate only ever changes the strategy, never the
    # answer)
    pairs = [(i, i + 1) for i in range(10)]
    assert _comps(spark, pairs, driver_edge_limit=5) == [list(range(11))]


# ---------------- materialized co-purchase pair artifact ----------------


def test_copurchase_artifact_matches_fresh_build(spark):
    """The once-per-sf_dir snapshot artifact must be value-identical
    to a fresh rebuild from lineitem (rebuild=True bypasses it)."""
    from koalas_spark.queries.mining import copurchase_pair_table

    sf = "/root/testdata/sf0.001"
    cached = copurchase_pair_table(spark, sf).collect()
    fresh = copurchase_pair_table(spark, sf, rebuild=True).collect()
    key = lambda r: (r["u"], r["v"])
    assert sorted(map(tuple, cached)) == sorted(map(tuple, fresh))
    assert len({key(r) for r in cached}) == len(cached)  # (u,v) unique


def test_daily_revenue_artifact_matches_fresh_build(spark):
    """The once-per-sf_dir daily-revenue snapshot artifact must be
    value-identical to a fresh rebuild from orders (rebuild=True
    bypasses it) — the #170 discipline applied to the day domain."""
    from koalas_spark.queries.analytics import daily_revenue_table

    sf = "/root/testdata/sf0.001"
    cached = daily_revenue_table(spark, sf).collect()
    fresh = daily_revenue_table(spark, sf, rebuild=True).collect()
    assert sorted(map(tuple, cached)) == sorted(map(tuple, fresh))
    assert len({r["d"] for r in cached}) == len(cached)  # d unique


def test_snapshot_replace_commit(spark, tmp_path):
    """replace=True publishes a manifest listing ONLY the new data
    dir — latest readers see a full replacement, while the previous
    version stays readable (time travel intact)."""
    from koalas_spark.sources.snapshots import read_snapshot, write_snapshot

    p = str(tmp_path / "tbl")
    df1 = spark.range(5).withColumnRenamed("id", "x")
    df2 = spark.range(100, 103).withColumnRenamed("id", "x")
    v1 = write_snapshot(df1, p)
    v2 = write_snapshot(df2, p, replace=True)
    assert (v1, v2) == (1, 2)
    latest = sorted(r["x"] for r in read_snapshot(spark, p).collect())
    assert latest == [100, 101, 102]
    pinned = sorted(r["x"] for r in read_snapshot(spark, p, version=1).collect())
    assert pinned == [0, 1, 2, 3, 4]


def test_bfs_layer_plan_shape(spark):
    """Pin the PER-HOP expansion plan of mining._bfs_layer_counts
    (ADVICE r11 medium): khop_reach_copurchase and
    harmonic_centrality_probes execute the whole BFS at
    DataFrame-construction time, so tools/audit_plans.py SKIPs them —
    this test is the replacement scale gate. One hop must be a
    key-partitioned equi-join (frontier x edges) + distinct: shuffle
    hash/sort-merge only, never a broadcast nested loop or cartesian
    over the edge set."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "u bigint, v bigint"
    )
    seeds = spark.createDataFrame([(0,), (7,)], "s bigint")
    reach = seeds.select("s", F.col("s").alias("node"))
    expanded = reach.join(edges, reach["node"] == edges["u"]).select(
        "s", F.col("v").alias("node")
    )
    hop = reach.unionAll(expanded).distinct()
    jvm = spark._jvm  # noqa: SLF001
    plan = jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        hop._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the frontier join is an equi-join on the edge key
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan
    # the cumulative-reach dedup is a keyed aggregate, not a global op
    assert "HashAggregate" in plan

    # and the counts themselves stay exact on a known graph: a
    # 0-1-2-...-50 path symmetrized, seed 0 reaches hop+1 nodes,
    # seed 7 reaches 2*hop+1
    from koalas_spark.queries.mining import _bfs_layer_counts

    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    counts = _bfs_layer_counts(sym, seeds, hops=3)
    assert counts[(0, 1)] == 2 and counts[(0, 2)] == 3 and counts[(0, 3)] == 4
    assert counts[(7, 1)] == 3 and counts[(7, 2)] == 5 and counts[(7, 3)] == 7


def test_degree_artifact_matches_fresh_build(spark):
    """The materialized co-purchase degree artifact (round 12) must be
    value-identical to a fresh degree build from the edge set."""
    from koalas_spark.queries.mining import copurchase_degree_table

    sf = "/root/testdata/sf0.001"
    cached = copurchase_degree_table(spark, sf).collect()
    fresh = copurchase_degree_table(spark, sf, rebuild=True).collect()
    assert sorted(map(tuple, cached)) == sorted(map(tuple, fresh))
    assert len({r["x"] for r in cached}) == len(cached)  # node unique
