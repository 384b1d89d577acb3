"""Live status endpoint — the analog of the reference's heartbeat/monitor
surface (/root/reference/agent/manager.go:166-225 reports status over HTTP
to the monitor backend, monitor-be/agent.go:89-120 serves it).

For a batch engine the job's ground truth is its lineage artifacts, so the
endpoint simply serves them, recomputed per request:

* ``GET /status``  → job_metrics(out_dir): partitions done, rows in/routed/
  dropped, per-sink rows — the counters the reference exports to prometheus.
* ``GET /manifests`` → every per-partition lineage manifest.

Because ``run_flagship`` rewrites ``_metrics.json`` after every wave, the
endpoint is wave-accurate while a job is running in another process.

Localhost-only by default; stdlib ``http.server`` (no external deps).
CLI: ``python -m log_formatter_ray.state.status <out_dir> [port]``.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from log_formatter_ray.state.manifest import load_manifests
from log_formatter_ray.state.metrics import job_metrics


def _payload(out_dir: str, path: str):
    if path == "/status":
        return job_metrics(out_dir)
    if path == "/manifests":
        return {
            pid: dataclasses.asdict(m)
            for pid, m in sorted(load_manifests(out_dir).items())
        }
    return None


class _Handler(BaseHTTPRequestHandler):
    out_dir = ""

    def do_GET(self):  # noqa: N802 - http.server API
        body = _payload(self.out_dir, self.path)
        if body is None:
            self.send_error(404, "use /status or /manifests")
            return
        data = json.dumps(body, sort_keys=True).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet
        pass


def serve_status(
    out_dir: str, port: int = 0, host: str = "127.0.0.1"
) -> tuple[ThreadingHTTPServer, int]:
    """Start the status server on a daemon thread; returns (server, port).
    ``port=0`` picks a free port.  Call ``server.shutdown()`` to stop."""
    handler = type("_BoundHandler", (_Handler,), {"out_dir": out_dir})
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


if __name__ == "__main__":
    import sys
    import time

    out = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8765
    srv, port = serve_status(out, port)
    print(f"serving {out} on http://127.0.0.1:{port}/status")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()
