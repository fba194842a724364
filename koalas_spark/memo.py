"""Registry of the session-scoped artifact memos.

Several shared per-session artifacts (co-purchase pair/degree tables,
day-domain revenue, BM25 pipeline, MinHash signatures, k-means core,
NN-Descent graph, unigram-LM prefix, the spread documents/embeddings
scans) memoize a localCheckpoint in a module-level dict so that many
consumers within one session share one build — the right pipeline
shape at scale ("build the edge list once, fan out").

Measurement is a different matter: a timing harness that samples each
query several times and keeps the minimum would, with the memos left
alone, charge every shared build to exactly one discarded sample and
report memo-hit times for ~15 queries (the round-13 verdict's gaming
finding). Every memo dict therefore registers here, and bench.py
calls :func:`reset_session_artifacts` around each timed sample so
every sample pays its full computation from the parquet inputs. The
memos then only amortize work WITHIN one timed region (a single query
invocation) or across an untimed session (the oracle run, a real
pipeline).
"""

from __future__ import annotations

_REGISTRY: list[dict] = []


def register_memo(d: dict) -> dict:
    """Register a module-level session-memo dict; returns it unchanged."""
    _REGISTRY.append(d)
    return d


def reset_session_artifacts() -> None:
    """Drop every registered session memo.

    The dropped DataFrames' checkpoint blocks are released by Spark's
    ContextCleaner once the Python references die — callers that care
    about block-manager hygiene (bench.py) follow this with gc.
    """
    for d in _REGISTRY:
        d.clear()
