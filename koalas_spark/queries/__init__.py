"""Query registry.

Every operator in SURVEY.md §2 registers here as
    name -> (callable(spark, sf_dir) -> DataFrame, oracle_sql | None)
The driver (and tools/check_oracle.py) runs the Spark callable and the
DuckDB oracle side-by-side; column names and values must match exactly.

Cross-engine determinism rules used throughout:
  - double aggregations go through exact decimal summation:
    CAST(CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)
    — addition order no longer matters, so Spark and DuckDB agree
    bit-for-bit; the VARCHAR hop exists because DuckDB's direct
    DECIMAL->DOUBLE cast is not correctly rounded past 2^53/10^6
    (found by the sf1 scaling run — see SCALING.md);
  - per-row double arithmetic (x*(1-d)) is IEEE-deterministic and
    portable as-is;
  - counts are cast to BIGINT on the Spark side (DuckDB len()/count()
    return BIGINT, Spark size()/length() return INT);
  - top-k queries carry full tie-break orderings so membership is
    deterministic;
  - portable hashing uses md5 (identical hex in both engines);
  - dollars->cents (and any double->integer) quantization is
    FLOOR(x*100 + 0.5) on BOTH sides — DuckDB CAST(double AS BIGINT)
    ROUNDS while Spark truncates (r8 batch-5 sf1 catch);
  - integer division only on NON-NEGATIVE operands (DuckDB // floors,
    Spark div truncates toward zero — they disagree below zero);
    signed divisions use the sign-aware half-up form
    sign(s) * ((2|s| + n) // (2n)) or a shift-non-negative rewrite;
  - transcendentals (ln/exp) are quantized to integer nanos PER VALUE
    before any SUM (float sums are addend-order-dependent; integer
    sums are not) — the #221 discipline;
  - products that can exceed int64 at scale pre-cast ONE factor to
    DECIMAL(38): DuckDB multiplies DECIMAL(18)xDECIMAL(18) in int64
    storage width and overflows (r8 acf sf1 catch);
  - iterative chained-CTE oracles declare every step AS MATERIALIZED:
    DuckDB inlines CTEs per reference site, so a K-step chain whose
    step references its predecessor twice re-expands the upstream
    subtree 2^K times (r8 PCA fd-exhaustion / BFS 60 GB spill catch);
  - where a double expression is unavoidable it appears ONCE, with an
    IDENTICAL shape in the Spark code and the oracle SQL — IEEE ops
    on identical doubles are bit-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {k: v[0] for k, v in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from koalas_spark.queries import (  # noqa: F401
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        analytics10,
        analytics11,
        analytics12,
        analytics13,
        analytics14,
        analytics15,
        analytics16,
        analytics17,
        analytics18,
        analytics19,
        analytics20,
        analytics21,
        analytics22,
        analytics23,
        analytics24,
        analytics25,
        analytics26,
        analytics27,
        analytics28,
        analytics29,
        analytics30,
        analytics31,
        analytics32,
        analytics33,
        analytics34,
        analytics35,
        analytics36,
        analytics37,
        analytics38,
        analytics39,
        analytics40,
        analytics41,
        analytics42,
        analytics43,
        analytics44,
        analytics45,
        analytics46,
        analytics47,
        analytics48,
        analytics49,
        analytics50,
        analytics51,
        analytics52,
        analytics53,
        analytics54,
        analytics55,
        analytics56,
        analytics57,
        analytics58,
        analytics59,
        analytics60,
        analytics61,
        analytics62,
        analytics63,
        analytics64,
        analytics65,
        analytics66,
        analytics67,
        analytics68,
        analytics69,
        analytics70,
        corpus,
        graphq,
        layout,
        mining,
        parity,
        pipeline,
        retrieval,
        text,
        dedup,
        similarity,
        multimodal,
        streaming,
        tpch_partsupp,
    )

    _LOADED = True
