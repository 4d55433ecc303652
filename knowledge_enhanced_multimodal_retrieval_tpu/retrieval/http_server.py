"""Stdlib HTTP serving front-end over :class:`MicroBatcher`.

The reference has no serving daemon (its `RetrievalEngine` is a library
call, ``src/retrieval.py:79``); this provides one with zero dependencies:
a ``ThreadingHTTPServer`` whose request threads block on MicroBatcher
futures, so concurrent HTTP clients aggregate into batched device programs.

Endpoints:
- ``GET /healthz``                      -> ``{"ok": true, "stats": {...}}``
- ``GET /search?q=<query>[&n=<top-n>]`` -> ``{"query", "results"}``
- ``POST /search`` with JSON body ``{"query": "...", "n": 20}`` or
  ``{"queries": ["...", ...]}``        -> one or many result lists
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence
from urllib.parse import parse_qs, urlparse

from .server import MicroBatcher, Overloaded


def _parse_n(raw):
    """Validate a top-n parameter: positive int, else ``(None, error)``."""
    try:
        n = int(raw)
    except (TypeError, ValueError):
        return None, f"n must be an integer, got {raw!r}"
    if n < 1:
        return None, f"n must be >= 1, got {n}"
    return n, None


class RetrievalHTTPServer:
    """HTTP front-end; construct, then :meth:`serve_forever` (or use as a
    context manager around background serving via :meth:`start`)."""

    def __init__(
        self,
        batch_fn: Callable[[Sequence[str]], List[List[dict]]],
        host: str = "127.0.0.1",
        port: int = 8080,
        max_batch: int = 256,
        max_wait_ms: float = 2.0,
        default_n: int = 20,
        max_pending: int = 0,
    ):
        self.batcher = MicroBatcher(
            batch_fn, max_batch=max_batch, max_wait_ms=max_wait_ms, max_pending=max_pending
        )
        batcher = self.batcher

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/healthz":
                    self._send(200, {"ok": True, "stats": batcher.stats})
                    return
                if url.path == "/search":
                    params = parse_qs(url.query)
                    q = (params.get("q") or [None])[0]
                    if not q:
                        self._send(400, {"error": "missing q parameter"})
                        return
                    n, err = _parse_n((params.get("n") or [default_n])[0])
                    if err:
                        self._send(400, {"error": err})
                        return
                    try:
                        results = batcher.retrieve(q)
                    except Overloaded as e:  # load shed -> 503, retryable
                        self._send(503, {"error": str(e)})
                        return
                    except Exception as e:  # backend failure -> 502
                        self._send(502, {"error": str(e)})
                        return
                    self._send(200, {"query": q, "results": results[:n]})
                    return
                self._send(404, {"error": f"unknown path {url.path}"})

            def do_POST(self):
                url = urlparse(self.path)
                if url.path != "/search":
                    self._send(404, {"error": f"unknown path {url.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                except Exception as e:
                    self._send(400, {"error": f"bad JSON body: {e}"})
                    return
                n, err = _parse_n(payload.get("n", default_n))
                if err:
                    self._send(400, {"error": err})
                    return
                try:
                    if "queries" in payload:
                        futs = [batcher.submit(q) for q in payload["queries"]]
                        out = [f.result()[:n] for f in futs]
                        self._send(200, {"queries": payload["queries"], "results": out})
                    elif "query" in payload:
                        results = batcher.retrieve(payload["query"])
                        self._send(200, {"query": payload["query"], "results": results[:n]})
                    else:
                        self._send(400, {"error": "body needs 'query' or 'queries'"})
                except Overloaded as e:
                    self._send(503, {"error": str(e)})
                except Exception as e:
                    self._send(502, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None
        self._serving = False

    @property
    def address(self) -> tuple:
        return self._httpd.server_address

    def serve_forever(self) -> None:
        self._serving = True
        self._httpd.serve_forever()

    def start(self) -> "RetrievalHTTPServer":
        """Serve on a background thread (for tests / embedding)."""
        self._serving = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="kemr-http"
        )
        self._thread.start()
        return self

    def close(self) -> None:
        # shutdown() blocks on an event only serve_forever() ever sets —
        # calling it on a server that never served would deadlock forever.
        if self._serving:
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join()
        self.batcher.close()

    def __enter__(self) -> "RetrievalHTTPServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
