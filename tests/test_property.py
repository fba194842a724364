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


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=30
    )
)
def test_cc_driver_path_matches_networkless_reference(spark, edges):
    """Driver union-find vs an independent pure-python reachability
    closure on random edge soups (self-loops included)."""
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    got = {}
    for r in connected_components(edf, driver_edge_limit=10**6).collect():
        got.setdefault(r["comp"], set()).add(r["node"])
    # reference: repeated closure
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, want = set(), []
    for n in sorted(adj):
        if n in seen:
            continue
        comp, stack = set(), [n]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        seen |= comp
        want.append(comp)
    assert sorted(map(sorted, got.values())) == sorted(map(sorted, want))


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-10, 10, allow_nan=False, allow_infinity=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_int8_quantize_error_bound(spark, vecs):
    """|v - q*amax/127| <= amax/254 per element (half-up rounding to a
    127-step grid), and zero vectors quantize to zero."""
    from koalas_spark.operators.similarity import int8_quantize

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {r.x: (r.qv, r.qn) for r in int8_quantize(df, "vec_id", "embedding", "x")
           .selectExpr("x", "_x_qv AS qv", "_x_qn AS qn").collect()}
    import numpy as np

    for i, v in enumerate(vecs):
        v64 = np.array(v, dtype=np.float32).astype(np.float64)
        amax = np.abs(v64).max()
        qv = np.array(out[i][0], dtype=np.int64)
        if amax == 0:
            assert (qv == 0).all() and out[i][1] == 0
            continue
        recon = qv * (amax / 127.0)
        assert np.max(np.abs(v64 - recon)) <= amax / 127.0 / 2 + 1e-9
        assert out[i][1] == int(qv @ qv)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["pgm", "ppm"]),
)
def test_netpbm_roundtrip_random_rasters(w, h, seed, fmt):
    import numpy as np

    from koalas_spark.operators.multimodal import decode_image, encode_pgm, encode_ppm

    rng = np.random.default_rng(seed)
    if fmt == "pgm":
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        blob = encode_pgm(img)
    else:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_ppm(img)
    got, _ = decode_image(blob)
    np.testing.assert_array_equal(got, img)


@settings(**_SETTINGS)
@given(
    left=st.lists(st.tuples(_keys, _times), min_size=1, max_size=25),
    right=st.lists(st.tuples(_keys, _times), min_size=1, max_size=25),
)
def test_asof_forward_matches_pandas(spark, left, right):
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
        direction="forward",
    )
    got_map = {r["lid"]: r["matched_rt"] for r in got.collect()}
    lpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "lt"]
    ).sort_values(["lt", "lid"])
    rpd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right)], columns=["rid", "k", "rt"]
    ).sort_values(["rt", "rid"])
    ref = pd.merge_asof(
        lpd, rpd, left_on="lt", right_on="rt", by="k", direction="forward"
    )
    for _, row in ref.iterrows():
        want = None if pd.isna(row["rt"]) else int(row["rt"])
        assert got_map[row["lid"]] == want, (row["lid"], got_map[row["lid"]], want)
