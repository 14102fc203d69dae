"""Paginated REST ingest source (SURVEY §2.1 S1-S3, §2.8 C1-C3).

Re-expresses the reference's VMHub client semantics Spark-first:

* per-endpoint page-size caps — clientes<=10, vendas<=1000
  (reference src/api/vmhub_client.py:115-118; configured page sizes
  src/config/endpoints.py:40,47,57,64);
* error taxonomy — 404 fatal, 429 retry, 5xx at page>0 = end-of-data
  sentinel, empty page = end-of-data (src/api/vmhub_client.py:70-78;
  src/main.py:70-72);
* exponential backoff x1.5 with jitter and a max cap
  (src/api/vmhub_client.py:93-103; budget src/main.py:316-319);
* page-bisect salvage — after max retries on a multi-record page, refetch
  record-by-record with page_size=1 to isolate a poison record and keep the
  good rows (src/main.py:111-178);
* skip-and-continue — a failed page/day never aborts the run
  (src/main.py:172-178, :231-251).

Execution model: the DRIVER never fetches data. It enumerates (date, page)
task specs as a DataFrame; ``mapInPandas`` workers execute the fetch loop
with the full retry taxonomy, emitting one JSON string per record. At
cluster scale that is N executors fetching concurrently with Spark's own
task retry on top (spark.task.maxFailures) — replacing the reference's
2-thread ThreadPoolExecutor (src/main.py:330) with real horizontal
parallelism. The REST source's statefulness (retry budget, EOF sentinel)
stays in worker code, outside Catalyst (SURVEY §7 decision 4).

MockVMHubAPI stands in for the network (no live endpoints in this
environment); its failure injection reproduces the taxonomy above so tests
exercise every branch. A real HTTP client drops into ``RestIngestor`` via
the ``transport`` callable without touching the Spark plumbing.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass


class FatalHTTPError(Exception):
    """404-class: the endpoint/tenant is wrong; abort this endpoint
    (reference src/api/vmhub_client.py:70-72)."""


class RetryableHTTPError(Exception):
    """429/5xx-at-page-0: worth retrying (src/api/vmhub_client.py:73-74)."""


class NoMoreDataError(Exception):
    """5xx at page>0 — the API's de-facto end-of-data signal
    (src/api/vmhub_client.py:75-78)."""


# page-size caps per endpoint (reference src/api/vmhub_client.py:115-118)
PAGE_SIZE_CAPS = {"clientes": 10, "vendas": 1000}


@dataclass(frozen=True)
class EndpointConfig:
    """Per-endpoint source spec — the reference's Endpoint dataclass
    (src/config/endpoints.py:8-17)."""

    name: str
    page_size: int
    requires_date_range: bool = False
    max_retries: int = 3
    backoff_initial: float = 0.0  # seconds; 0 in tests (reference: 1.0)
    backoff_multiplier: float = 1.5
    backoff_max: float = 16.0
    # bounded random jitter: sleep = min(backoff + U(0, jitter_frac*backoff),
    # backoff_max) — decorrelates retry storms across workers
    # (reference src/api/vmhub_client.py:94-95)
    jitter_frac: float = 0.1
    # inter-page pacing: client-side rate limit between successful pages
    # (reference src/main.py:86 sleeps 0.5 s/page); 0 in tests
    page_delay: float = 0.0

    def __post_init__(self) -> None:
        cap = PAGE_SIZE_CAPS.get(self.name)
        if cap is not None and self.page_size > cap:
            raise ValueError(
                f"page_size {self.page_size} exceeds API cap {cap} for {self.name!r}"
            )


class MockVMHubAPI:
    """Deterministic in-memory stand-in for the VMHub REST API.

    ``records``: dict endpoint -> list of dicts (optionally keyed by date).
    ``fail_plan``: dict (endpoint, page) -> list of outcomes consumed per
    call: int = HTTP status to raise, 'poison' = corrupt page (fails unless
    page_size == 1 isolates it down to non-poison records).
    """

    def __init__(
        self,
        records: dict[str, list[dict]],
        fail_plan: dict[tuple[str, int], list[object]] | None = None,
    ) -> None:
        self.records = records
        self.fail_plan = fail_plan or {}
        self.calls: list[tuple[str, int, int]] = []

    def get(self, endpoint: str, page: int, page_size: int) -> list[dict]:
        self.calls.append((endpoint, page, page_size))
        plan = self.fail_plan.get((endpoint, page))
        if plan:
            outcome = plan.pop(0)
            if outcome == "poison":
                if page_size > 1:
                    raise RetryableHTTPError("HTTP 500: poison page")
                # single-record fetch: poison only if the record itself is bad
            elif isinstance(outcome, int):
                if outcome == 404:
                    raise FatalHTTPError("HTTP 404")
                if outcome == 429:
                    raise RetryableHTTPError("HTTP 429")
                if outcome >= 500:
                    if page > 0:
                        raise NoMoreDataError(f"HTTP {outcome} at page {page}")
                    raise RetryableHTTPError(f"HTTP {outcome}")
        rows = self.records.get(endpoint, [])
        start = page * page_size
        return rows[start : start + page_size]


class RestIngestor:
    """The per-worker fetch loop with the reference's full error taxonomy."""

    def __init__(self, cfg: EndpointConfig, transport: Callable[[str, int, int], list[dict]],
                 sleeper: Callable[[float], None] | None = None,
                 rng: Callable[[], float] | None = None) -> None:
        import random
        import time

        self.cfg = cfg
        self.transport = transport
        # real sleeping by default (workers must honor backoff/pacing);
        # tests inject a recording sleeper or run with zero backoff
        self.sleep = sleeper or time.sleep
        self.rng = rng or random.random  # injectable for deterministic tests

    def _fetch_with_backoff(self, page: int, page_size: int) -> list[dict]:
        """Retry loop: backoff x multiplier, bounded jitter, capped at
        backoff_max (reference src/api/vmhub_client.py:44-103; jitter term
        :94-95 — uniform(0, jitter_frac*backoff) added BEFORE the cap, so
        concurrent workers hitting the same 429 storm desynchronize)."""
        backoff = self.cfg.backoff_initial
        last: Exception | None = None
        attempts = self.cfg.max_retries + 1
        for attempt in range(attempts):
            try:
                return self.transport(self.cfg.name, page, page_size)
            except (FatalHTTPError, NoMoreDataError):
                raise
            except Exception as e:  # retryable
                last = e
                if attempt == attempts - 1:
                    break  # no retry left — don't burn a dead sleep
                jitter = self.rng() * self.cfg.jitter_frac * backoff
                self.sleep(min(backoff + jitter, self.cfg.backoff_max))
                backoff = max(backoff, 0.1) * self.cfg.backoff_multiplier
        raise last if last else RuntimeError("unreachable")

    def _bisect_page(self, page: int) -> list[dict]:
        """Salvage a poison page record-by-record with page_size=1
        (reference src/main.py:111-178; range math :119-120)."""
        out: list[dict] = []
        base = page * self.cfg.page_size
        for offset in range(self.cfg.page_size):
            try:
                rows = self._fetch_with_backoff(base + offset, 1)
            except NoMoreDataError:
                break
            except Exception:
                continue  # skip exactly the poison record (src/main.py:172-178)
            if not rows:
                break
            out.extend(rows)
        return out

    def fetch_all(
        self, max_pages: int = 10_000, start_page: int = 0, stride: int = 1
    ) -> Iterator[list[dict]]:
        """Sequential page loop with EOF on empty page (src/main.py:57-72)
        and client-side inter-page pacing (src/main.py:86).

        ``start_page``/``stride`` stripe the page space across concurrent
        workers (worker s of N fetches pages s, s+N, s+2N, ...): each
        worker's loop still terminates on its first empty/NoMoreData page,
        which is correct for the empty-page-EOF protocol because every page
        past the true end is empty. Pacing applies per worker."""
        for page in range(start_page, max_pages * stride, stride):
            if page != start_page and self.cfg.page_delay:
                self.sleep(self.cfg.page_delay)
            try:
                rows = self._fetch_with_backoff(page, self.cfg.page_size)
            except NoMoreDataError:
                return
            except FatalHTTPError:
                raise
            except Exception:
                rows = self._bisect_page(page)
                if not rows:
                    return
                yield rows
                continue
            if not rows:
                return
            yield rows


def fetch_endpoint_distributed(
    spark,
    cfg: EndpointConfig,
    transport_factory: Callable[[], Callable[[str, int, int], list[dict]]],
    dates: list[str] | None = None,
    tasks_per_date: int = 1,
):
    """Distributed ingest: driver enumerates (date, worker-slot) task specs;
    each Spark task runs the sequential fetch loop for its slice and emits
    records as JSON strings (+ the lineage envelope fields the reference
    adds per record, src/main.py:33-40).

    Returns a DataFrame[date string, page long, record string]. Callers
    parse ``record`` with an explicit schema (schema.spec.compile_schema +
    from_json) — same split as the reference's land-then-load.

    ``transport_factory`` must be picklable and is invoked executor-side,
    once per (date, slot) task; for a live API it builds an HTTP session
    there — credentials resolve driver-side and travel as task data, never
    as executor state (reference's credential flow, src/main.py:301-310).
    Factories that accept an optional date argument (http_transport_factory
    does) are called with the task's date so each slice fetches ITS day's
    range; zero-arg factories keep working for date-agnostic endpoints.

    ``tasks_per_date`` stripes the page space: slot s of N fetches pages
    s, s+N, s+2N, ... (see fetch_all), so one hot date parallelizes across
    N tasks instead of one sequential loop — valid under the
    empty-page-EOF protocol since every page past the true end is empty.
    """
    import pandas as pd

    # Executors need RestIngestor/EndpointConfig; a library caller may not
    # have this package on the worker PYTHONPATH (sys.path edits are
    # driver-only). Registering this module for by-value pickling ships the
    # code inside the task closure instead of by module reference.
    from ..functions.pickling import ship_module_by_value

    ship_module_by_value(__name__)

    n_slots = max(1, tasks_per_date)
    spec_rows = [
        (d, s) for d in (dates or ["__nodate__"]) for s in range(n_slots)
    ]
    specs = spark.createDataFrame(spec_rows, "date string, slot int").repartition(
        len(spec_rows)
    )

    import dataclasses

    cfg_dict = dataclasses.asdict(cfg)  # every field survives into tasks

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datetime import datetime, timezone

        worker_cfg = EndpointConfig(**cfg_dict)

        def make_ingestor(date_str: str) -> RestIngestor:
            # date-aware factories get the task's date (each slice fetches
            # its own day's range); zero-arg factories stay supported
            try:
                transport = transport_factory(
                    None if date_str == "__nodate__" else date_str
                )
            except TypeError:
                transport = transport_factory()
            return RestIngestor(worker_cfg, transport)

        def batch_instant() -> str:
            # one ISO instant per batch (reference src/main.py:35); inlined
            # so the worker closure has no cross-module imports
            return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")

        for pdf in batches:
            for d, slot in zip(pdf["date"], pdf["slot"]):
                ing = make_ingestor(d)
                rows_out: list[tuple[str, int, str]] = []
                ts = batch_instant()
                pages = ing.fetch_all(start_page=int(slot), stride=n_slots)
                for stripe_no, page_rows in enumerate(pages):
                    page_no = int(slot) + stripe_no * n_slots
                    for rec in page_rows:
                        rec = dict(rec)
                        rec["ingestion_timestamp"] = ts
                        rec["source_system"] = "VMHUB"
                        rows_out.append((d, page_no, json.dumps(rec, sort_keys=True)))
                if rows_out:
                    yield pd.DataFrame(rows_out, columns=["date", "page", "record"])

    return specs.mapInPandas(work, "date string, page long, record string")
