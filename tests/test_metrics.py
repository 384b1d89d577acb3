"""Job metrics summary (prometheus-counter analog) from lineage manifests."""

import json
import os

from log_formatter_ray.pipelines.flagship import run_flagship
from log_formatter_ray.state.metrics import job_metrics


def test_metrics_written_and_consistent(corpus_dir, tmp_path):
    out = str(tmp_path / "o")
    res = run_flagship(corpus_dir, out)
    path = os.path.join(out, "_metrics.json")
    assert os.path.exists(path)
    with open(path) as f:
        m = json.load(f)
    assert m == job_metrics(out)
    assert m["rows_in"] == m["rows_routed"] == 5000
    assert m["rows_dropped"] == 0
    assert m["partitions_done"] == 4
    assert m["per_sink_rows"]["sink_quarantine"] == 100
    assert sum(m["per_sink_rows"].values()) == 5000  # counter conservation
    assert m["token_bytes"] == res.token_bytes


def test_status_endpoint_serves_metrics_and_manifests(corpus_dir, tmp_path):
    """The heartbeat/monitor analog (manager.go:166-225): /status serves the
    per-wave-refreshed counters, /manifests the lineage records."""
    import json
    import urllib.request

    from log_formatter_ray.pipelines.flagship import run_flagship
    from log_formatter_ray.state.status import serve_status

    out = str(tmp_path / "o")
    run_flagship(corpus_dir, out)
    srv, port = serve_status(out)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/status") as r:
            status = json.load(r)
        assert status["partitions_done"] == 4
        assert status["rows_in"] == 5000
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/manifests") as r:
            manifests = json.load(r)
        assert len(manifests) == 4
        assert all("sink_counts" in m for m in manifests.values())
        import urllib.error
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_config_push_applies_at_next_wave_boundary(corpus_dir, tmp_path):
    """The controller→agent loop (controller.go:54-85 → manager.go:122-164):
    a config POSTed over HTTP mid-job is validated, lands atomically in the
    out dir, and the pushed route rules take effect at the next wave
    boundary — manifests show BOTH rule-sets, split at the push point."""
    import urllib.error
    import urllib.request

    from log_formatter_ray.state.status import (
        pushed_config_reloader,
        serve_status,
    )

    out = str(tmp_path / "o")
    os.makedirs(out, exist_ok=True)
    srv, port = serve_status(out)
    pushed_yaml = """
input: {parquet: {path: unused}}
pipeline: {}
route:
  rules:
    - {sink: sink_pushed, when: [{field: n_tok, op: ">=", value: 0}]}
  default: sink_pushed_default
output: {parquet: {path: unused}}
"""

    def post(body: str):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/config",
            data=body.encode(),
            method="POST",
        )
        return urllib.request.urlopen(req)

    try:
        # invalid push (missing mandatory sections) is rejected with 400
        # and leaves no file behind
        try:
            post("route: {rules: []}")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # deep validation: sections present but the route rule is
        # malformed (no sink) — must 400 at POST time, never crash the
        # job at the next wave boundary
        try:
            post(
                "input: {parquet: {path: x}}\npipeline: {}\n"
                "route: {rules: [{when: [{field: n_tok, op: '>=', value: 0}]}]}\n"
                "output: {parquet: {path: x}}"
            )
            raise AssertionError("expected 400 for sink-less rule")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert not os.path.exists(os.path.join(out, "_config_push.yml"))

        inner = pushed_config_reloader(out)
        calls = {"n": 0}

        def reload_config():
            # the "controller" pushes over HTTP between waves 2 and 3 —
            # run_flagship is synchronous, so the push is injected at the
            # wave boundary exactly as a live controller's would land
            calls["n"] += 1
            if calls["n"] == 3:
                with post(pushed_yaml) as r:
                    assert json.load(r)["status"] == "accepted"
            return inner()

        res = run_flagship(corpus_dir, out, wave_size=1,
                           reload_config=reload_config)
    finally:
        srv.shutdown()

    # push applied exactly once and the file is consumed
    assert os.path.exists(os.path.join(out, "_config_push.yml.applied"))
    assert not os.path.exists(os.path.join(out, "_config_push.yml"))
    sinks_per_wave = [set(res.manifests[p].sink_counts)
                     for p in sorted(res.manifests)]
    pushed = [s for s in sinks_per_wave if "sink_pushed" in s]
    old = [s for s in sinks_per_wave if s & {"sink_premium", "sink_standard"}]
    assert len(pushed) == 2 and len(old) == 2  # waves 1-2 old, 3-4 pushed
    for s in pushed:
        assert not (s & {"sink_premium", "sink_standard", "sink_long"})
