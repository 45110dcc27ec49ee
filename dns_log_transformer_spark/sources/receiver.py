"""Firehose HTTP-endpoint receiver -> landing directory.

The reference's only entry point is `POST /endpoint` served by Flask
(/root/reference/app/app.py:60-102). Spark streams are pull-based, so the
HTTP hop becomes this thin receiver: accept the Firehose request, land the
body durably as one file, ack. `readStream` (streaming/source.py
read_firehose_stream) tails the landing directory.

Reproduced reference behavior:
- `POST /endpoint` with the Firehose ack contract: 200
  {requestId, timestamp} on accept (app/app.py:99-102); 400 with
  errorMessage on a non-JSON content type (app/app.py:69-74) or an
  unparseable body;
- `GET /health` -> 200 (app/app.py:265-267).

Deliberate upgrade (documented for parity review): the reference acks
BEFORE processing and loses accepted records on crash (fire-and-forget
executor.submit, app/app.py:96-102 — at-most-once). Here the ack happens
AFTER fsync+rename of the landing file, and the stream's checkpoint
replays unprocessed files — at-least-once end to end. Envelope/record
*validation* stays in-pipeline (transforms/envelope.py, decode, validate)
where rejects are quarantined as data, not just logged.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _now_ms() -> int:
    return int(time.time() * 1000)


class _Handler(BaseHTTPRequestHandler):
    landing_dir: str = "."

    def log_message(self, fmt, *args):  # quiet; diagnostics are data here
        pass

    def _send(self, code: int, body: dict) -> None:
        payload = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):
        if self.path == "/health":
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self._send(404, {"errorMessage": "not found"})

    def do_POST(self):
        if self.path != "/endpoint":
            self._send(404, {"errorMessage": "not found"})
            return
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        if ctype != "application/json":
            # mirror of app/app.py:69-74
            self._send(
                400,
                {
                    "requestId": "unknown",
                    "timestamp": _now_ms(),
                    "errorMessage": "Content-Type must be application/json",
                },
            )
            return
        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length)
        try:
            body = json.loads(raw)
            request_id = body.get("requestId", "unknown")
        except (json.JSONDecodeError, UnicodeDecodeError):
            self._send(
                400,
                {
                    "requestId": "unknown",
                    "timestamp": _now_ms(),
                    "errorMessage": "request body is not valid JSON",
                },
            )
            return
        # land durably, THEN ack: tmp-write + fsync + atomic rename so the
        # file stream never sees a partial file and an acked batch is never
        # lost (the reference's at-most-once hole, app/app.py:96-102)
        name = f"{_now_ms()}-{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.landing_dir, f".{name}.tmp")
        final = os.path.join(self.landing_dir, name)
        with open(tmp, "w") as f:
            f.write(raw.decode("utf-8", errors="replace"))
            f.write("\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        self._send(200, {"requestId": request_id, "timestamp": _now_ms()})


class FirehoseReceiver:
    """Threaded HTTP receiver writing one landing file per request.

    Usage:
        rx = FirehoseReceiver(landing_dir, port=5555).start()
        ... readStream tails landing_dir ...
        rx.stop()
    """

    def __init__(self, landing_dir: str, host: str = "0.0.0.0", port: int = 0):
        os.makedirs(landing_dir, exist_ok=True)
        handler = type("BoundHandler", (_Handler,), {"landing_dir": landing_dir})
        self.server = ThreadingHTTPServer((host, port), handler)
        self.port = self.server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "FirehoseReceiver":
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()
        if self._thread is not None:
            self._thread.join()
