"""Endpoint fan-out orchestration (SURVEY §2.8 C1-C3).

The reference runs endpoints through a 2-worker ThreadPoolExecutor with
per-future error isolation (src/main.py:330-352). In Spark the same shape
is threads sharing one SparkSession — each thread submits independent jobs
and the Spark scheduler interleaves their stages across the cluster; a
failing endpoint is caught and reported without killing the others
(C3: per-day/per-endpoint try-continue, src/main.py:231-251).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass


@dataclass
class EndpointResult:
    endpoint: str
    ok: bool
    rows: int = 0
    error: str | None = None


def run_endpoints(
    jobs: dict[str, Callable[[], int]],
    max_workers: int = 2,
) -> list[EndpointResult]:
    """Run per-endpoint ingest jobs concurrently with error isolation.

    ``jobs``: endpoint name -> zero-arg callable returning a row count
    (typically: fetch -> enrich -> write_lake -> count). ``max_workers=2``
    mirrors the reference (src/main.py:330); raise it freely — Spark's
    scheduler, not the thread count, governs cluster utilization.
    """
    results: list[EndpointResult] = []
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {pool.submit(fn): name for name, fn in jobs.items()}
        for fut in as_completed(futures):
            name = futures[fut]
            try:
                rows = fut.result()
                results.append(EndpointResult(name, True, rows))
            except Exception as e:  # noqa: BLE001 — isolation is the point
                results.append(EndpointResult(name, False, error=f"{type(e).__name__}: {e}"))
    return sorted(results, key=lambda r: r.endpoint)
