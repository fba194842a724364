"""Derived-partsupp invariants and Spark<->DuckDB formula parity.

The four unadapted TPC-H queries (SURVEY §2.2 #391-394) stand on the
deterministic partsupp derivation in
koalas_spark/queries/tpch_partsupp.py; these tests pin the generator
itself so a drift in either engine's copy of the formula fails fast,
independent of any downstream query.
"""

import duckdb

from koalas_spark.queries.tpch_partsupp import PARTSUPP_SQL, _partsupp
from tests.conftest import SF_SMOKE


def _duck_partsupp():
    con = duckdb.connect()
    for t in ("part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return con.execute(
        f"WITH {PARTSUPP_SQL} SELECT * FROM partsupp "
        "ORDER BY ps_partkey, ps_suppkey, ps_supplycost_cents"
    ).fetchall()


def test_partsupp_formula_parity(spark):
    got = sorted(
        tuple(r)
        for r in _partsupp(spark, SF_SMOKE).collect()
    )
    want = sorted(tuple(r) for r in _duck_partsupp())
    assert got == want


def test_partsupp_invariants(spark):
    rows = _partsupp(spark, SF_SMOKE).collect()
    n_parts = (
        spark.read.parquet(f"{SF_SMOKE}/part.parquet").count()
    )
    n_supp = (
        spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").count()
    )
    # dbgen structure: exactly 4 offers per part
    assert len(rows) == 4 * n_parts
    per_part = {}
    for r in rows:
        per_part.setdefault(r.ps_partkey, []).append(r)
        assert 1 <= r.ps_suppkey <= n_supp
        assert 1 <= r.ps_availqty <= 9999
        assert 100 <= r.ps_supplycost_cents <= 100000
    assert all(len(v) == 4 for v in per_part.values())
    # the 4 offers of a part always carry 4 distinct costs, so the
    # Q2 per-part min-cost row is unique by construction
    for v in per_part.values():
        costs = {r.ps_supplycost_cents for r in v}
        assert len(costs) == 4
