"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on
DuckDB at the given sf dir, compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from koalas_spark import get_spark
from koalas_spark.queries import all_oracles, all_queries
from koalas_spark.sources.io import TPCH_TABLES


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, int):
        return str(int(v))
    return str(v)


def compare(sf_dir: str, names: list[str] | None = None) -> int:
    import os

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; Spark-written scaled dirs
        # (tools/make_scaled.py) need the part-file glob
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries, oracles = all_queries(), all_oracles()
    names = names or sorted(queries)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows-only {len(s_rows)} rows [{time.time()-t0:.1f}s]")
                continue
            cur = con.execute(oracles[name])
            raw_cols = [c[0] for c in cur.description]
            order = sorted(range(len(raw_cols)), key=lambda i: raw_cols[i])
            d_cols = [raw_cols[i] for i in order]
            d_rows = [tuple(_norm(row[i]) for i in order) for row in cur.fetchall()]
            status, detail = "OK", ""
            if s_cols != d_cols:
                status, detail = "SCHEMA-MISMATCH", f"spark={s_cols} duck={d_cols}"
            elif len(s_rows) != len(d_rows):
                status, detail = "COUNT-MISMATCH", f"spark={len(s_rows)} duck={len(d_rows)}"
            elif sorted(s_rows) != sorted(d_rows):
                status = "VALUE-MISMATCH"
                sset, dset = set(s_rows), set(d_rows)
                only_s = list(sset - dset)[:2]
                only_d = list(dset - sset)[:2]
                detail = f"spark-only={only_s} duck-only={only_d}"
            if status != "OK":
                failures += 1
            print(f"  {name}: {status} ({len(s_rows)} rows) [{time.time()-t0:.1f}s] {detail}")
        except Exception as e:
            failures += 1
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(names) - failures}/{len(names)} queries match")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    qnames = [a for a in args if "/" not in a] or None
    sys.exit(1 if compare(sf_dir, qnames) else 0)
