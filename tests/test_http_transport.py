"""Live-HTTP half of the REST source: HttpTransport against a local
http.server (no external network), status->taxonomy mapping, auth header,
URL-quoted tenant id, and end-to-end RestIngestor pagination over HTTP."""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from vmhub_data_pipeline_spark.sources import (
    EndpointConfig,
    FatalHTTPError,
    HttpTransport,
    NoMoreDataError,
    RestIngestor,
    RetryableHTTPError,
    http_transport_factory,
)

RECORDS = [{"id": i, "amount": i * 1.5} for i in range(25)]


class _Handler(BaseHTTPRequestHandler):
    seen: list[dict] = []

    def log_message(self, *a):  # silence request logging
        pass

    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        endpoint = url.path.strip("/").split("/")[-1]
        type(self).seen.append(
            {"endpoint": endpoint, "query": q, "headers": dict(self.headers)}
        )
        page = int(q.get("pagina", 0))
        if endpoint == "missing":
            return self._send(404, b"not found")
        if endpoint == "ratelimited":
            return self._send(429, b"slow down")
        if endpoint == "flaky5xx":
            return self._send(503, b"boom")
        if endpoint == "notalist":
            return self._send(200, json.dumps({"error": "dict body"}).encode())
        # happy endpoint: paginate RECORDS
        size = int(q.get("quantidade", 10))
        body = json.dumps(RECORDS[page * size : (page + 1) * size]).encode()
        return self._send(200, body)

    def _send(self, status, body):
        self.send_response(status)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    _Handler.seen = []
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}/api"
    httpd.shutdown()


def _transport(server, **kw):
    return HttpTransport(base_url=server, api_key="k-123", cnpj="12.345.678/0001-90", **kw)


def test_happy_page_fetch_sends_auth_and_quoted_cnpj(server):
    tr = _transport(
        server,
        date_start=datetime(2024, 1, 1, tzinfo=timezone.utc),
        date_end=datetime(2024, 1, 31, tzinfo=timezone.utc),
    )
    rows = tr("clientes", 0, 10)
    assert rows == RECORDS[:10]
    req = _Handler.seen[-1]
    assert req["headers"]["x-api-key"] == "k-123"
    assert req["headers"]["accept"] == "application/json"
    # CNPJ URL-quoted before param encoding (reference quote(cnpj),
    # src/api/vmhub_client.py:120): '/' must not survive as a raw slash
    assert req["query"]["CNPJ"] == "12.345.678%2F0001-90"
    assert req["query"]["dataInicio"] == "2024-01-01T00:00:00Z"
    assert req["query"]["somenteSucesso"] == "true"
    tr.close()


def test_status_taxonomy_mapping(server):
    tr = _transport(server)
    with pytest.raises(FatalHTTPError):
        tr("missing", 0, 10)
    with pytest.raises(RetryableHTTPError):
        tr("ratelimited", 0, 10)
    with pytest.raises(RetryableHTTPError):  # 5xx at page 0: retryable
        tr("flaky5xx", 0, 10)
    with pytest.raises(NoMoreDataError):  # 5xx at page>0: EOF sentinel
        tr("flaky5xx", 3, 10)
    with pytest.raises(RetryableHTTPError):  # non-list body
        tr("notalist", 0, 10)
    tr.close()


def test_connection_refused_is_retryable():
    tr = HttpTransport(base_url="http://127.0.0.1:1/api", api_key="k", cnpj="c", timeout=0.2)
    with pytest.raises(RetryableHTTPError):
        tr("clientes", 0, 10)


def test_rest_ingestor_end_to_end_over_http(server):
    # the full fetch loop (pagination, EOF-on-empty) through a real socket
    cfg = EndpointConfig("clientes", page_size=10)
    factory = http_transport_factory(server, api_key="k-123", cnpj="123")
    got = [r for page in RestIngestor(cfg, factory()).fetch_all() for r in page]
    assert got == RECORDS


def test_factory_is_picklable():
    import pickle

    f = http_transport_factory("http://x/api", api_key="k", cnpj="c")
    tr = pickle.loads(pickle.dumps(f))()
    assert isinstance(tr, HttpTransport)
