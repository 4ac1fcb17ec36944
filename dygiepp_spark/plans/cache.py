"""Tracked persists: a release handle for operator-internal caches.

Several operators persist an intermediate that feeds multiple downstream
branches (coref mentions, near-dup shingle/band tables). The persist is the
right call at scale — it is the difference between scanning the corpus once
and N times — but a long-lived session that calls these operators repeatedly
must be able to release the blocks, and the operator itself cannot unpersist
before its (lazy) result is consumed. So every such persist registers here,
and callers invoke :func:`release_tracked` once they have materialized what
they need. Unpersisting early is always safe (Spark falls back to
recomputing the lineage); it only costs the cache win.

Pinned by tests/test_conll_coref.py: repeated metric calls keep
``sc.getPersistentRDDs`` flat."""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist()
        n += 1
    return n
