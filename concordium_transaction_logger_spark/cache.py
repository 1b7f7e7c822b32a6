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


def get_or_build(
    cache_name: str, spark: Any, sf_dir: str, build: Callable[[], Any]
) -> Any:
    """Return the cached artifact for (spark, sf_dir), building it once.

    ``build`` runs lazily on first use; the cached value is returned only
    when the stored session is *identically* the caller's session."""
    cache = _CACHES.setdefault(cache_name, {})
    key = (id(spark), sf_dir)
    hit = cache.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    value = build()
    cache[key] = (spark, value)
    return value
