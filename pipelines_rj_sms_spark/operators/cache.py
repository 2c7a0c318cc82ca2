"""Scoped-cache bookkeeping for operators that persist() intermediates.

Several candidate-pair operators persist a subplan that both sides of a
self-join consume (without it the whole upstream pipeline runs twice).
Spark's CacheManager does NOT free those blocks when the Python objects
go out of scope — in a long-lived session repeated operator calls would
accumulate cached blocks until executor storage fills. The fix is a
explicit lifecycle: operators register their persisted intermediates on
the DataFrame they return via ``track``; callers release them with
``release(df)`` once an action has materialized what they need.

Blocks also remain evictable (MEMORY_AND_DISK default) so an unreleased
handle degrades performance, not correctness — release() is hygiene for
long sessions, mandatory nowhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_rj_sms_persisted"

# Session-scoped safety net: every persisted frame track() has ever seen.
# The per-result attr chain is the precise release mechanism, but it
# lives on a Python object — any withColumn/select/filter after track()
# returns a NEW DataFrame without the attr, silently orphaning the chain.
# The registry survives those transforms, so release_all() can always
# free what per-result release() lost track of (long-session hygiene).
_LIVE: list[DataFrame] = []


def _register(p: DataFrame) -> None:
    if not any(q is p for q in _LIVE):
        _LIVE.append(p)


def track(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Attach persisted intermediates to the result for later release.

    Intermediates already tracked on any of the ``persisted`` frames are
    carried over, so composed operators (curation funnel -> LSH ->
    jaccard) accumulate one flat release list on the final result.
    NOTE: the attr does NOT survive DataFrame transforms — if you
    modify the result after track(), re-attach with
    ``track(modified, original)``.
    """
    chain: list[DataFrame] = list(getattr(result, _ATTR, ()))
    for p in persisted:
        chain.extend(getattr(p, _ATTR, ()))
        if p.is_cached:
            chain.append(p)
    for p in chain:
        _register(p)
    # register the result itself too when it is cached: the common
    # single-arg idiom ``track(df.persist())`` would otherwise leave
    # df invisible to release_all() — release(df) frees it, but any
    # post-track transform orphans it with no backstop (the
    # plan_audit persist-leak class).
    if result.is_cached:
        _register(result)
    setattr(result, _ATTR, tuple(chain))
    return result


def release(df: DataFrame) -> int:
    """Unpersist every intermediate tracked on ``df`` (and ``df`` itself
    if cached). Call after materializing the result (collect/write).
    Returns the number of frames unpersisted."""
    n = 0
    for p in getattr(df, _ATTR, ()):
        if p.is_cached:
            p.unpersist()
            n += 1
        _forget(p)
    setattr(df, _ATTR, ())
    if df.is_cached:
        df.unpersist()
        n += 1
        _forget(df)
    return n


def _forget(p: DataFrame) -> None:
    for i, q in enumerate(_LIVE):
        if q is p:
            del _LIVE[i]
            return


def release_all() -> int:
    """Unpersist EVERY intermediate any track() call registered this
    session — the backstop for chains orphaned by post-track transforms.
    Call between pipeline stages in a long-lived session. Returns the
    number of frames unpersisted."""
    n = 0
    for p in _LIVE:
        if p.is_cached:
            p.unpersist()
            n += 1
    _LIVE.clear()
    return n
