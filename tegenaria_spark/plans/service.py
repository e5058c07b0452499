"""HTTP control plane — the reference's remote status service rebuilt
as a thin stdlib HTTP skin over :class:`CrawlEngine`.

Reference: /root/reference/service/service.go:64-191 exposes
``GetStatus``/``SetStatus`` over gRPC with an HTTP gateway; statuses are
ON/PAUSE/OFF (constant.go).  The Spark rebuild keeps the driver as the
single orchestrator (SURVEY.md §2.7), so the service runs inside the
driver process and manipulates the engine exactly the way a local
caller would:

- ``GET  /status``            → ``engine.status()`` (zero Spark jobs —
  everything comes from commit markers)
- ``POST /status {"status": "PAUSE"}`` → cooperative pause at the next
  round boundary (engine.request_pause; the committed snapshot is the
  checkpoint)
- ``POST /status {"status": "ON"}``    → resume: starts
  ``engine.run(resume=True, **run_kwargs)`` on a background thread if
  the engine is not already running
- ``POST /status {"status": "OFF"}``   → graceful stop: same boundary
  pause, but the service refuses later ON until restarted (the
  reference's engine close semantics, service.go:119-147)

No third-party dependencies (stdlib ``http.server``); the server thread
is a daemon and never blocks engine work.

gRPC transport (the reference's primary protocol, service.go:149-191):
HARD ENVIRONMENT CONSTRAINT — ``grpcio``/``protobuf`` are not installed
in this sandbox and cannot be installed (no network), verified round 4
(``import grpc`` → ModuleNotFoundError).  The functional surface
(SetStatus/GetStatus verbs, ON/PAUSE/OFF semantics, background resume)
is complete over HTTP; a gRPC skin would be a protocol adapter over the
same ``ControlPlane`` methods.  Same treatment as the Iceberg jars
(sources/store.py:36-66): constraint recorded, capability delivered on
the available transport.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class ControlPlane:
    """Owns the HTTP server and the resume thread for one engine."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0, **run_kwargs):
        self.engine = engine
        self.run_kwargs = run_kwargs
        self._stopped = False  # OFF is terminal until service restart
        self._run_thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        plane = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: the engine logs rounds
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.rstrip("/") in ("", "/status"):
                    self._reply(200, plane.get_status())
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path.rstrip("/") != "/status":
                    self._reply(404, {"error": f"no route {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    status = str(req.get("status", "")).upper()
                except (ValueError, TypeError):
                    self._reply(400, {"error": "malformed JSON body"})
                    return
                try:
                    self._reply(200, plane.set_status(status))
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                except RuntimeError as e:
                    self._reply(409, {"error": str(e)})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server_thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- lifecycle ----------------------------------------------------------

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    def start(self) -> "ControlPlane":
        self._server_thread.start()
        return self

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- the two verbs (service.go:64-147) ----------------------------------

    def get_status(self) -> dict:
        s = dict(self.engine.status())
        s["service"] = "stopped" if self._stopped else "serving"
        return s

    def set_status(self, status: str) -> dict:
        if status not in ("ON", "PAUSE", "OFF"):
            raise ValueError(f"unknown status {status!r}: expected ON|PAUSE|OFF")
        with self._lock:
            if status == "PAUSE":
                self.engine.request_pause()
                return {"ok": True, "action": "pause_requested"}
            if status == "OFF":
                self._stopped = True
                self.engine.request_pause()
                return {"ok": True, "action": "stopping_at_round_boundary"}
            # ON: resume from the last committed snapshot
            if self._stopped:
                raise RuntimeError("service is OFF — restart the driver to resume")
            if self._run_thread is not None and self._run_thread.is_alive():
                return {"ok": True, "action": "already_running"}
            t = threading.Thread(
                target=self.engine.run,
                kwargs={"resume": True, **self.run_kwargs},
                daemon=True,
            )
            t.start()
            self._run_thread = t
            return {"ok": True, "action": "resumed"}

    def join(self, timeout: Optional[float] = None) -> None:
        """Wait for the current run thread (if any) to finish."""
        if self._run_thread is not None:
            self._run_thread.join(timeout)
