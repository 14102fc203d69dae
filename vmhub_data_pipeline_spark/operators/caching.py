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

import atexit
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


def dir_fingerprint(*paths: str) -> str:
    """Stable digest of the dirs' data-file listing (relpath, size): a
    compiled plan over these paths is valid exactly as long as this value
    — an appended batch, a replay that rewrites part-files in place
    (fresh file UUIDs), or a rebuilt artifact all change it, so a
    probe-frame cache keyed on it can never serve a stale file index.
    Driver-side metadata walk only (~file count of the dir); checkpoint
    dirs and dot/underscore bookkeeping files are skipped.

    sha256 over the sorted listing, NOT the builtin ``hash()`` (ADVICE
    r11): ``hash()`` is PYTHONHASHSEED-salted per process, which is fine
    for in-process cache keys but silently breaks the first time a
    fingerprint is persisted or compared across processes — the exact
    cross-process regime the stable artifact store runs in."""
    import hashlib
    import os

    acc: list[tuple] = []
    for root in paths:
        for dirpath, _dirs, files in os.walk(root):
            if "_ckpt" in dirpath:
                continue
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, f), root)
                acc.append(
                    (root, rel, os.stat(os.path.join(dirpath, f)).st_size)
                )
    payload = "\n".join(f"{r}\t{rel}\t{sz}" for r, rel, sz in sorted(acc))
    return hashlib.sha256(payload.encode()).hexdigest()


# Caches whose values own on-disk scratch (landed NDJSON fixtures, the
# persisted IVF-PQ index copy) registered for a process-exit sweep: the
# evict-on-insert path only reclaims a session's scratch when a LATER
# session inserts into the same cache, so the FINAL session's dirs would
# outlive the process (ADVICE r8). One atexit hook drains them all.
_EXIT_SWEEPS: list[tuple[dict, Any]] = []


def sweep_at_exit(cache: dict, on_evict: Any) -> dict:
    """Register ``cache`` for the process-exit sweep (idempotent per cache
    object): at interpreter shutdown every remaining value is passed to
    ``on_evict`` and the cache cleared. Returns the cache so call sites
    can register at definition time."""
    for c, _ in _EXIT_SWEEPS:
        if c is cache:
            return cache
    _EXIT_SWEEPS.append((cache, on_evict))
    return cache


@atexit.register
def _sweep_all() -> None:
    for cache, on_evict in _EXIT_SWEEPS:
        for v in list(cache.values()):
            try:
                on_evict(v)
            except Exception:
                pass  # shutdown-path cleanup must never mask the exit
        cache.clear()
