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
