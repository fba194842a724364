"""connected_components semantics on known graphs."""

from pyspark.sql import functions as F

from koalas_spark.operators.graph import connected_components


def _comps(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges).collect()
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
