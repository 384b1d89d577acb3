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
