"""Tracked persists: scoped release handles for operator-internal caches.

Several operators persist an intermediate that feeds multiple downstream
branches (coref mentions, near-dup shingle/band tables). The persist is the
right call at scale — it is the difference between scanning the corpus once
and N times — but a long-lived session that calls these operators repeatedly
must be able to release the blocks, and the operator itself cannot unpersist
before its (lazy) result is consumed. So every such persist registers here
and callers release it once they have materialized what they need.
Unpersisting early is always safe (Spark falls back to recomputing the
lineage); it only costs the cache win.

Scoping (r3 ADVICE): tracking is a per-thread STACK of scopes, not one
process-global list. ``release_tracked()`` releases only the innermost
active scope on the calling thread, so

- a caller that wraps build+consume in ``with scoped():`` releases exactly
  the persists created inside the block — an inner ``release_tracked()``
  (e.g. a registry metric's ``finally``) can never unpersist an outer
  caller's still-in-use caches and silently forfeit their N-scans-to-1 win;
- concurrent Spark jobs on different driver threads (parallel bench loops,
  a streaming listener next to a batch job) each get an independent stack —
  no cross-thread list mutation.

Pinned by tests/test_conll_coref.py: repeated metric calls keep
``sc.getPersistentRDDs`` flat; tests/test_plans.py: nested scopes release
only their own persists and threads are isolated."""

from __future__ import annotations

import threading
from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame

_local = threading.local()


def _stack() -> list[list[DataFrame]]:
    st = getattr(_local, "stack", None)
    if st is None:
        st = [[]]  # root scope: always present per thread
        _local.stack = st
    return st


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame with the calling thread's
    innermost scope for later release."""
    _stack()[-1].append(df)
    return df


def release_tracked() -> int:
    """Unpersist every DataFrame tracked in the calling thread's innermost
    active scope (the nearest ``scoped()`` block, else the thread's root
    scope); returns how many were released. Outer scopes are untouched."""
    bucket = _stack()[-1]
    n = 0
    while bucket:
        bucket.pop().unpersist()
        n += 1
    return n


def maybe_persist(
    df: DataFrame,
    decide_on: DataFrame | None = None,
    persist: bool | str = "auto",
) -> DataFrame:
    """Persist-and-track ``df`` iff the multi-branch reuse is worth the
    materialization job (r5 VERDICT #4: extend the near-dup adaptive
    persist to every unconditional multi-branch persist).

    ``persist="auto"`` (default) delegates to
    ``operators.dedup.persist_decision`` on ``decide_on`` (the upstream
    FILE-BACKED input whose size Catalyst estimates accurately — pass the
    source scan, not a derived plan) or on ``df`` itself: persist above
    the measured crossover, recompute below it. The threshold is borrowed
    from the near-dup shingle crossover measurement (documented there;
    re-measured every round by bench.py) — the regimes rhyme (tiny inputs
    pay more for the materialization job than N recomputes cost) even
    though the exact crossover differs per operator. True/False force a
    regime; other strings raise (a typo must not silently persist)."""
    if isinstance(persist, str):
        if persist != "auto":
            raise ValueError(
                f"persist must be True, False, or 'auto'; got {persist!r}"
            )
        from dygiepp_spark.operators.dedup import persist_decision

        persist, _ = persist_decision(decide_on if decide_on is not None else df)
    if persist:
        from pyspark import StorageLevel

        return track(df.persist(StorageLevel.MEMORY_AND_DISK))
    return df


@contextmanager
def scoped() -> Iterator[None]:
    """Scope tracked persists: everything ``track()``-ed inside the block
    (on this thread) is released when the block exits — build the operator
    result AND consume it inside the block. Nested scopes compose; each
    releases only its own persists."""
    st = _stack()
    bucket: list[DataFrame] = []
    st.append(bucket)
    try:
        yield
    finally:
        st.pop()
        while bucket:
            bucket.pop().unpersist()
