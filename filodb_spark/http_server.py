"""Minimal Prometheus-compatible HTTP API server.

Reference surface: http/src/main/scala/filodb/http/PrometheusApiRoute.scala
(GET /promql/{dataset}/api/v1/query_range | query | labels |
label/{l}/values | series). Stdlib http.server — the serving layer is
deliberately thin; all work happens in the engine. One Spark driver
serves queries concurrently via Spark's own scheduler (FIFO here;
scheduler pools would isolate tenants, SURVEY §4.2).
"""

from __future__ import annotations

import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from filodb_spark import api as render
from filodb_spark import metadata as md


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, msg, code=400):
            self._send({"status": "error", "errorType": "bad_data",
                        "error": msg}, code)

        def do_POST(self):
            # Prometheus remote read: snappy-compressed protobuf in/out
            # (PrometheusApiRoute.scala:130)
            url = urlparse(self.path)
            if not url.path.rstrip("/").endswith("/api/v1/read"):
                return self._error(f"unknown endpoint {url.path}", 404)
            try:
                from filodb_spark import remote_read as rr
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                accepted = rr.decode_accepted_types(rr.snappy_decompress(raw))
                if rr.STREAMED_XOR_CHUNKS in accepted:
                    body = rr.run_read_request_streamed(engine, raw)
                    ctype = ("application/x-streamed-protobuf; "
                             "proto=prometheus.ChunkedReadResponse")
                    cenc = None
                else:           # SAMPLES — the universal fallback
                    body = rr.run_read_request(engine, raw)
                    ctype, cenc = "application/x-protobuf", "snappy"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                if cenc:
                    self.send_header("Content-Encoding", cenc)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as ex:
                traceback.print_exc()
                self._error(f"remote read: {ex}", 400)

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                path = url.path.rstrip("/")
                if path.endswith("/api/v1/query_range"):
                    resp = render.query_range_api(
                        engine, q["query"], float(q["start"]),
                        float(q["end"]), float(q.get("step", "60")))
                elif path.endswith("/api/v1/query"):
                    resp = render.query_api(engine, q["query"],
                                            float(q["time"]))
                elif path.endswith("/api/v1/labels"):
                    resp = {"status": "success",
                            "data": [r["label"] for r in
                                     md.label_names(engine.store,
                                                    q.get("match[]")).collect()]}
                elif "/api/v1/label/" in path and path.endswith("/values"):
                    label = path.split("/api/v1/label/")[1].rsplit("/", 1)[0]
                    resp = {"status": "success",
                            "data": [r["value"] for r in
                                     md.label_values(engine.store, label,
                                                     q.get("match[]")).collect()]}
                elif path.endswith("/api/v1/series"):
                    resp = {"status": "success",
                            "data": [dict(r["labels"]) for r in
                                     md.series(engine.store,
                                               q["match[]"]).collect()]}
                else:
                    return self._error(f"unknown endpoint {url.path}", 404)
                self._send(resp)
            except (SyntaxError, ValueError, KeyError) as ex:
                self._error(f"{type(ex).__name__}: {ex}")
            except Exception as ex:  # pragma: no cover
                traceback.print_exc()
                self._error(f"internal: {ex}", 500)

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 0):
    """Start the API server on a background thread; returns the server
    (use .server_address, .shutdown())."""
    srv = ThreadingHTTPServer((host, port), make_handler(engine))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
