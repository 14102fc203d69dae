"""Shared eviction discipline for the module-level model/index caches.

Every fitted-model cache in this repo (IVF/PQ/IVF-PQ indexes, LSH pair
sets, BPE merge tables, order-statistic preambles) keys its entries on
``spark.sparkContext.applicationId`` first, so a new session can never
read a stale handle — but until round 8 nothing ever REMOVED entries for
stopped sessions, so a long-lived multi-session driver process (a
notebook kernel, a test runner cycling SparkSessions) leaked driver
memory and pinned localCheckpoint RDD references (ADVICE r7).

``session_cache_put`` is the single insert path: it drops every entry
whose leading applicationId differs from the inserting session's before
adding the new one. Eviction-on-insert keeps reads lock-free-cheap (the
hot path is ``dict.get``) and bounds each cache at one session's working
set. ``bounded_cache_put`` is the variant for caches whose keys are
session-INDEPENDENT (prepared Column expression trees): there is no
applicationId to expire on, so it holds a small FIFO of recent models —
plenty for a server cycling a handful of live models, and a hard bound
for everything else.
"""

from __future__ import annotations

from typing import Any


def session_cache_put(
    cache: dict, key: tuple, value: Any, on_evict: Any = None
) -> Any:
    """Insert ``value`` under ``key`` (whose first element must be the
    current applicationId), evicting entries from other sessions.

    ``on_evict(old_value)`` runs for each evicted entry — required when
    the cached value owns an external resource (the landed-NDJSON scratch
    dirs in queries/streaming_queries.py pass ``shutil.rmtree``):
    dropping the dict reference alone would leak one corpus copy on disk
    per stopped session."""
    app_id = key[0]
    stale = [k for k in cache if k[0] != app_id]
    for k in stale:
        old = cache.pop(k)
        if on_evict is not None:
            on_evict(old)
    cache[key] = value
    return value


def bounded_cache_put(cache: dict, key: tuple, value: Any, max_entries: int = 64) -> Any:
    """Insert into a session-independent cache with a FIFO size bound
    (dicts iterate in insertion order, so the oldest key is first)."""
    while len(cache) >= max_entries:
        del cache[next(iter(cache))]
    cache[key] = value
    return value
