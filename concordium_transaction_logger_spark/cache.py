"""Session-scoped materialization cache.

The engine materializes per-(session, corpus) index artifacts once — the
enriched feed, shingle/minhash/LSH-bucket indexes, IVF centroids and
assignment (the analog of the reference's Postgres indexes, paid for at
ingest, never per query). Each was previously keyed on ``id(spark)``,
which is unsafe across session lifetimes: CPython recycles ids after the
old session is garbage-collected, so a *new* session could inherit a dead
session's DataFrames. This helper stores the session object itself in the
value — keeping it referenced makes id reuse impossible, and the identity
check makes a hit unambiguous.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHES: dict[str, dict[tuple[int, str], tuple[Any, Any]]] = {}


def _is_stopped(session: Any) -> bool:
    """Dead ONLY on an affirmative signal; a probe failure reads as
    alive (classifying it dead would silently evict every cache entry on
    every call, disabling all session indexes for that session type).

    Two probes, most-specific first:

    - ``session.is_stopped`` — the Spark Connect session's own liveness
      property (plain Python, no JVM round-trip; classic sessions don't
      have it and fall through). Without this probe a long-lived process
      cycling Connect sessions would never sweep them and regrow exactly
      the unbounded driver-memory cache _sweep_dead exists to prevent.
    - ``sparkContext._jsc.sc().isStopped()`` — the classic JVM probe.

    The cost of the lenient default is bounded — a genuinely-stopped
    session whose probes BOTH error keeps its entries until process
    exit, which is where a classic session's entries would die anyway."""
    try:
        v = session.is_stopped
        if isinstance(v, bool):
            return v
    except Exception:
        pass
    try:
        return session.sparkContext._jsc.sc().isStopped() is True
    except Exception:
        return False


def _sweep_dead() -> None:
    """Drop entries whose session has been stopped: holding them would pin
    the dead session's py4j graph (and its persisted blocks' metadata)
    forever — a long-lived process that recreates sessions would otherwise
    grow driver memory monotonically, with no way to evict (the identity
    check requires the original session object). Liveness is memoized per
    session FOR THIS SWEEP — one py4j round-trip per distinct session,
    not per cached entry (sweeps run on every get_or_build)."""
    status: dict[int, bool] = {}

    def stopped(sess: Any) -> bool:
        i = id(sess)
        if i not in status:
            status[i] = _is_stopped(sess)
        return status[i]

    for cache in _CACHES.values():
        for key in [k for k, (sess, _) in cache.items() if stopped(sess)]:
            sess, value = cache.pop(key)
            try:
                if hasattr(value, "unpersist"):
                    value.unpersist()
            except Exception:
                pass  # the backing context is gone; dropping the ref suffices


def get_or_build(
    cache_name: str, spark: Any, sf_dir: str, build: Callable[[], Any]
) -> Any:
    """Return the cached artifact for (spark, sf_dir), building it once.

    ``build`` runs lazily on first use; the cached value is returned only
    when the stored session is *identically* the caller's session. Each
    call opportunistically sweeps entries belonging to stopped sessions."""
    _sweep_dead()
    cache = _CACHES.setdefault(cache_name, {})
    key = (id(spark), sf_dir)
    hit = cache.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    value = build()
    cache[key] = (spark, value)
    return value


def release_corpus(spark: Any, sf_dir: str) -> None:
    """Drop (and unpersist) every cached artifact for one (session,
    corpus) pair — the eviction half of the index cache, for harnesses
    that sweep many corpora through one session (scale_slopes.py builds
    per-corpus shingle/minhash/LSH/IVF/k-means indexes; without eviction
    the persisted blocks of every past corpus pin executor memory until
    the session dies)."""
    key = (id(spark), sf_dir)
    for cache in _CACHES.values():
        hit = cache.pop(key, None)
        if hit is not None and hit[0] is spark and hasattr(hit[1], "unpersist"):
            hit[1].unpersist()
