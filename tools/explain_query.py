"""Dump .explain("formatted") for named queries to plans/$SPARK_GRAFT_PLANS_ROUND/
(default r14).

Usage: python tools/explain_query.py <suffix> <query> [query ...]
Writes plans/<round>/<query>_<suffix>.txt. Builds the DataFrame (some
queries execute work at construction time) but does not run the noop
sink, so the captured plan is the pre-execution AQE plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from koalas_spark import get_spark
from koalas_spark.queries import all_queries


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain_r13")
    queries = all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    )
    os.makedirs(outdir, exist_ok=True)
    jvm = spark._jvm  # noqa: SLF001
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
