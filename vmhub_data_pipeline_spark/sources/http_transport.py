"""Live HTTP transport for RestIngestor (SURVEY §2.1 S1 — the production
half of the source; MockVMHubAPI remains the Spark-test default).

Maps real HTTP semantics onto the taxonomy RestIngestor consumes, matching
the reference client (src/api/vmhub_client.py):

* ``requests.Session`` with ``accept: application/json`` and an
  ``x-api-key`` header auth slot (:38-42);
* query params ``CNPJ`` (URL-quoted, :120), ``pagina``, ``quantidade``
  (:121-124), optional ``dataInicio``/``dataTermino``/``somenteSucesso``
  (:126-131);
* status mapping (:70-78): 404 -> FatalHTTPError, 429 -> RetryableHTTPError,
  5xx at page>0 -> NoMoreDataError (the API's de-facto EOF), any other
  error -> RetryableHTTPError. Retry/backoff/jitter themselves live in
  RestIngestor._fetch_with_backoff — the transport performs exactly ONE
  request per call, so the policy is testable without a network.

The session is built lazily per transport instance, so
``http_transport_factory(...)`` pickles cleanly into Spark tasks and each
executor worker opens its own connection pool (sessions hold sockets —
never ship one through a closure).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from urllib.parse import quote

from .rest import FatalHTTPError, NoMoreDataError, RetryableHTTPError


@dataclass
class HttpTransport:
    """Callable ``(endpoint, page, page_size) -> list[dict]`` over HTTP."""

    base_url: str
    api_key: str
    cnpj: str
    timeout: float = 30.0
    date_start: datetime | None = None
    date_end: datetime | None = None
    somente_sucesso: bool = True
    _session: object = field(default=None, repr=False, compare=False)

    def _get_session(self):
        if self._session is None:
            try:
                import requests
            except ImportError as e:  # pragma: no cover - requests is baked in
                raise RuntimeError(
                    "HttpTransport requires the 'requests' package; "
                    "use MockVMHubAPI or a custom transport callable instead"
                ) from e
            s = requests.Session()
            s.headers.update({"accept": "application/json", "x-api-key": self.api_key})
            self._session = s
        return self._session

    def __call__(self, endpoint: str, page: int, page_size: int) -> list[dict]:
        params: dict[str, object] = {
            # URL-quote the tenant id (P8; reference quote(cnpj) :120).
            # requests encodes params again, so an id containing '/' goes on
            # the wire DOUBLE-encoded (%252F) — deliberately bug-compatible:
            # the reference passes quote(cnpj) into requests params too
            # (vmhub_client.py:120-125), and the server expects that form.
            "CNPJ": quote(self.cnpj, safe=""),
            "pagina": page,
            "quantidade": page_size,
        }
        if self.date_start and self.date_end:
            params.update(
                {
                    "dataInicio": self.date_start.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "dataTermino": self.date_end.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "somenteSucesso": str(self.somente_sucesso).lower(),
                }
            )
        url = f"{self.base_url.rstrip('/')}/{endpoint}"
        try:
            resp = self._get_session().get(url, params=params, timeout=self.timeout)
        except Exception as e:  # connection refused/reset, DNS, timeout
            raise RetryableHTTPError(f"request failed: {e}") from e

        status = resp.status_code
        if status == 404:
            raise FatalHTTPError(f"HTTP 404: endpoint not found: {endpoint}")
        if status == 429:
            raise RetryableHTTPError("HTTP 429: rate limited")
        if status >= 500:
            if page > 0:
                raise NoMoreDataError(f"HTTP {status} at page {page}")
            raise RetryableHTTPError(f"HTTP {status}")
        if status >= 400:
            raise RetryableHTTPError(f"HTTP {status}")

        try:
            data = resp.json()
        except ValueError as e:
            raise RetryableHTTPError(f"non-JSON response: {e}") from e
        if not isinstance(data, list):
            # reference treats a non-list body as a hard protocol error
            # (src/api/vmhub_client.py:135-137)
            raise RetryableHTTPError(f"unexpected response format: {type(data).__name__}")
        return data

    def close(self) -> None:
        if self._session is not None:
            self._session.close()
            self._session = None


@dataclass(frozen=True)
class http_transport_factory:
    """Picklable factory for ``fetch_endpoint_distributed``: invoked once per
    executor worker, so every worker gets its own connection pool. A class
    (not a closure) so plain pickle works, not just cloudpickle."""

    base_url: str
    api_key: str
    cnpj: str
    timeout: float = 30.0
    date_start: datetime | None = None
    date_end: datetime | None = None

    def __call__(self, date_str: str | None = None) -> HttpTransport:
        """fetch_endpoint_distributed passes the task's date slice so each
        worker fetches ITS day's range (reference daily loop,
        src/main.py:243); without it every slice would re-fetch the
        factory-frozen range. Closed day bounds per SURVEY §7 decision 1."""
        date_start, date_end = self.date_start, self.date_end
        if date_str is not None:
            d = datetime.strptime(date_str, "%Y-%m-%d")
            date_start = d
            date_end = d.replace(hour=23, minute=59, second=59)
        return HttpTransport(
            base_url=self.base_url,
            api_key=self.api_key,
            cnpj=self.cnpj,
            timeout=self.timeout,
            date_start=date_start,
            date_end=date_end,
        )
