"""HTTP server for the read-side APIs (src/RamenHttpHelpers.ml,
`ramen graphite --port` / `ramen httpd`).

Routes (matching the reference's routers):

- ``GET/POST /metrics/find?query=…[&from=…&until=…]`` and
  ``/render?target=…&from=…&until=…[&maxDataPoints=…]`` — the
  Graphite impersonator (RamenGraphite.ml:586-…); Grafana can point a
  graphite datasource at this port;
- ``POST /api/v1`` (and bare ``/api``) — the JSON-RPC v1 dispatcher
  (RamenApi.ml router);
- ``GET /version`` — liveness.

Implementation: ``http.server`` ThreadingHTTPServer delegating to
api.metrics_find/render/jsonrpc_handle. The GIL serializes handler
bodies around Spark driver calls, which is the reference's situation
too (one HTTP thread in the OCaml daemon); heavy lifting runs on the
executors either way. Start with ``serve(spark, catalog, port=0)`` →
returns the server (``server.server_address[1]`` for the resolved
port, ``shutdown()`` to stop)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from ramen_spark.api import ArchiveCatalog, jsonrpc_handle, metrics_find, render

__all__ = ["serve"]


def _make_handler(spark: SparkSession, catalog: ArchiveCatalog, table_prefix: str, alerts_store: dict | None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # tests stay quiet
            pass

        def _send(self, code: int, body: str, ctype: str = "application/json"):
            raw = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def _route(self, body: bytes | None) -> None:
            u = urlparse(self.path)
            qs = parse_qs(u.query)
            # POSTed form params merge with the query string (Grafana
            # POSTs /render with form-encoded targets)
            if body and self.headers.get(
                "Content-Type", ""
            ).startswith("application/x-www-form-urlencoded"):
                for k, v in parse_qs(body.decode("utf-8")).items():
                    qs.setdefault(k, []).extend(v)
            path = u.path.rstrip("/")
            try:
                if path == "/metrics/find":
                    q = qs.get("query", ["*"])[0]
                    since = float(qs["from"][0]) if "from" in qs else None
                    until = float(qs["until"][0]) if "until" in qs else None
                    self._send(
                        200,
                        json.dumps(
                            metrics_find(spark, catalog, q, since, until)
                        ),
                    )
                elif path == "/render":
                    targets = qs.get("target", [])
                    since = float(qs.get("from", ["0"])[0])
                    until = float(qs.get("until", ["0"])[0])
                    mdp = int(qs.get("maxDataPoints", ["100"])[0])
                    self._send(
                        200,
                        json.dumps(
                            render(spark, catalog, targets, since, until, mdp)
                        ),
                    )
                elif path in ("/api", "/api/v1"):
                    if body is None:
                        self._send(400, '{"error": "POST a JSON-RPC body"}')
                    else:
                        self._send(
                            200,
                            jsonrpc_handle(
                                spark, catalog, body.decode("utf-8"),
                                table_prefix=table_prefix,
                                alerts_store=alerts_store,
                            ),
                        )
                elif path == "/version":
                    self._send(200, '"v1"')
                else:
                    self._send(404, '{"error": "no such route"}')
            except Exception as e:  # surface as a 500, keep serving
                self._send(500, json.dumps({"error": repr(e)}))

        def do_GET(self):
            self._route(None)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0") or "0")
            self._route(self.rfile.read(n) if n else b"")

    return Handler


def serve(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    host: str = "127.0.0.1",
    port: int = 0,
    table_prefix: str = "",
    alerts_store: dict | None = None,
) -> ThreadingHTTPServer:
    """Start the HTTP read surface on a daemon thread; port 0 picks an
    ephemeral port (``server.server_address[1]``)."""
    srv = ThreadingHTTPServer(
        (host, port), _make_handler(spark, catalog, table_prefix, alerts_store)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
