"""Live status + config-push endpoint — the analog of the reference's
heartbeat/monitor surface (/root/reference/agent/manager.go:166-225 reports
status over HTTP to the monitor backend, monitor-be/agent.go:89-120 serves
it) and of the controller→agent config push
(/root/reference/controller/controller.go:54-85 PUTs a config that
agent/manager.go:122-164 hot-swaps).

For a batch engine the job's ground truth is its lineage artifacts, so the
endpoint simply serves them, recomputed per request:

* ``GET /status``  → job_metrics(out_dir): partitions done, rows in/routed/
  dropped, per-sink rows — the counters the reference exports to prometheus.
* ``GET /manifests`` → every per-partition lineage manifest.
* ``POST /config`` → validated (mandatory ``input``/``pipeline``/``output``
  sections, exactly the reference's check) and written atomically to
  ``<out_dir>/_config_push.yml``; ``pushed_config_reloader(out_dir)`` turns
  it into a ``run_flagship(reload_config=...)`` callable that applies the
  push at the next WAVE boundary — closing the controller→agent loop.

Because ``run_flagship`` rewrites ``_metrics.json`` after every wave, the
endpoint is wave-accurate while a job is running in another process.

Localhost-only by default; stdlib ``http.server`` (no external deps).
CLI: ``python -m log_formatter_ray.state.status <out_dir> [port]``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from log_formatter_ray.state.manifest import load_manifests
from log_formatter_ray.state.metrics import job_metrics

PUSHED_CONFIG_NAME = "_config_push.yml"


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

    def do_POST(self):  # noqa: N802 - http.server API
        if self.path != "/config":
            self.send_error(404, "POST supports /config only")
            return
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length).decode()
        try:
            from log_formatter_ray.config import load_config_str

            cfg = load_config_str(body)  # mandatory-section validation
            # DEEP validation: actually build everything the reloader will
            # build, so an accepted push can never crash the running job at
            # the next wave boundary (a malformed route rule / unreadable
            # lookup must 400 HERE, not raise mid-job)
            _extract_flagship_overrides(cfg)
        except Exception as ex:  # noqa: BLE001 — any parse error is a 400
            self.send_error(400, f"invalid config: {ex}".replace("\n", " "))
            return
        path = os.path.join(self.out_dir, PUSHED_CONFIG_NAME)
        tmp = path + ".tmp"
        os.makedirs(self.out_dir, exist_ok=True)
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, path)  # atomic: the reloader never sees a torn file
        data = json.dumps({"status": "accepted", "path": path}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # quiet
        pass


def _extract_flagship_overrides(cfg: dict) -> dict:
    """The pieces of a (pushed) config the flagship hot-swaps: ``rules``
    from the ``route`` section and ``lookup`` from an ``enrich`` formatter
    entry.  Shared by POST-time deep validation and the reloader, so
    whatever the endpoint accepted is exactly what the reloader can
    build."""
    from log_formatter_ray.stages.route import make_router

    out = {}
    route = cfg.get("route")
    if route:
        out["rules"] = make_router(route).rules
    for entry in (cfg.get("pipeline") or {}).get("formatters", []):
        (name, sub), = entry.items()
        if name == "enrich" and sub:
            import pyarrow as pa
            import pyarrow.parquet as pq

            if "lookup_path" in sub:
                out["lookup"] = pq.read_table(sub["lookup_path"])
            elif "lookup" in sub:
                out["lookup"] = pa.table(sub["lookup"])
    return out


def pushed_config_reloader(out_dir: str):
    """→ a zero-arg callable for ``run_flagship(reload_config=...)``: at
    each wave boundary it checks for a controller-pushed config
    (``POST /config`` above), parses it, and returns the pieces the
    flagship hot-swaps (``_extract_flagship_overrides``).  Each push
    applies exactly once; partitions always run under one config version,
    recorded in their manifests.

    Race-free hand-off: the reloader CLAIMS the file with an atomic rename
    BEFORE reading it, so a push landing mid-reload stays at the pushed
    path for the next wave instead of being renamed away unapplied; a
    config that fails to build (possible only if the file bypassed the
    endpoint's deep validation) is quarantined to ``.rejected`` with a
    warning rather than crashing the running job."""
    import logging

    path = os.path.join(out_dir, PUSHED_CONFIG_NAME)
    claimed = path + ".applying"

    def reload():
        try:
            os.replace(path, claimed)  # atomic claim-before-read
        except FileNotFoundError:
            return None
        from log_formatter_ray.config import load_config_file

        try:
            out = _extract_flagship_overrides(load_config_file(claimed))
        except Exception:  # noqa: BLE001 — never crash the job mid-run
            logging.getLogger("log_formatter_ray").warning(
                "pushed config failed to build; quarantined to .rejected",
                exc_info=True,
            )
            os.replace(claimed, path + ".rejected")
            return None
        os.replace(claimed, path + ".applied")
        return out or None

    return reload


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
