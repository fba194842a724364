"""Property-based tests (hypothesis): custom operators vs brute-force
single-node references on randomized inputs. These cover the
operators whose semantics do NOT reduce to a single SQL oracle —
the as-of join's union-sort implementation, graph components, and
gap sessionization — across shapes the fixed test tables never hit
(empty keys, all-ties, singleton groups, dense duplicates).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from koalas_spark.operators.asof import asof_join
from koalas_spark.operators.graph import connected_components

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=50)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(_keys, _times), min_size=1, max_size=25),
    right=st.lists(st.tuples(_keys, _times), min_size=1, max_size=25),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lt long"
    )
    rdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)], "rid long, k long, rt long"
    )
    got = asof_join(
        ldf,
        rdf,
        left_key="k",
        right_key="k",
        left_time="lt",
        right_time="rt",
        payload_cols={"rt": "matched_rt"},
        right_order_cols=["rid"],
    )
    got_map = {r["lid"]: r["matched_rt"] for r in got.collect()}

    lpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "lt"]
    ).sort_values(["lt", "lid"])
    rpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)], columns=["rid", "k", "rt"]
    ).sort_values(["rt", "rid"])
    ref = pd.merge_asof(
        lpd, rpd, left_on="lt", right_on="rt", by="k", direction="backward"
    )
    for _, row in ref.iterrows():
        want = None if pd.isna(row["rt"]) else int(row["rt"])
        assert got_map[row["lid"]] == want, (row["lid"], got_map[row["lid"]], want)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {}
    for r in connected_components(edf).collect():
        got.setdefault(r["comp"], set()).add(r["node"])

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want: dict[int, set] = {}
    for n in parent:
        want.setdefault(find(n), set()).add(n)

    assert sorted(map(sorted, got.values())) == sorted(map(sorted, want.values()))
    # canonical label is the component minimum
    for comp, members in got.items():
        assert comp == min(members)


@settings(**_SETTINGS)
@given(
    ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40)
)
def test_gap_sessionization_matches_bruteforce(spark, ts):
    gap = 1800
    df = spark.createDataFrame([(1, t, i) for i, t in enumerate(ts)], "u long, s long, eid long")
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy("s", "eid")
    delta = F.col("s") - F.lag("s").over(w)
    is_new = F.when(delta.isNull() | (delta > gap), 1).otherwise(0)
    sess = (
        df.withColumn("sid", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("u", "sid")
        .agg(F.min("s").alias("start"), F.max("s").alias("end"), F.count(F.lit(1)).alias("n"))
    )
    got = sorted((r["start"], r["end"], r["n"]) for r in sess.collect())

    want = []
    cur = []
    for t in sorted(ts):
        if cur and t - cur[-1] > gap:
            want.append((cur[0], cur[-1], len(cur)))
            cur = []
        cur.append(t)
    want.append((cur[0], cur[-1], len(cur)))
    assert got == sorted(want)
