"""Job metrics — the observability analog of the reference's prometheus
queue counters (`put_/get_` per queue on :2112/metrics,
/root/reference/agent/connector/queue.go:24-59) and 5 s heartbeat/status
(/root/reference/agent/manager.go:166-225).

For a batch job the natural form is a metrics summary derived from the
per-partition lineage manifests, written as ``_metrics.json`` beside the
outputs after every run/wave — both a monitoring artifact and a cheap
progress probe (a resuming operator can read it instead of listing
manifests).
"""

from __future__ import annotations

import json
import os

from log_formatter_ray.state.manifest import load_manifests


def job_metrics(out_dir: str) -> dict:
    """Aggregate every manifest under ``out_dir`` into counter totals."""
    manifests = load_manifests(out_dir)
    per_sink: dict[str, int] = {}
    rows_in = routed = dropped = token_bytes = 0
    for m in manifests.values():
        rows_in += m.rows_in
        routed += m.rows_routed
        dropped += m.rows_dropped
        token_bytes += m.token_bytes
        for sink, n in m.sink_counts.items():
            per_sink[sink] = per_sink.get(sink, 0) + n
    return {
        "partitions_done": len(manifests),
        "rows_in": rows_in,            # ≈ put_in_gate counter
        "rows_routed": routed,         # ≈ get_out_gate counter
        "rows_dropped": dropped,       # parse-failure drops (pipeline.go:158-167)
        "token_bytes": token_bytes,
        "per_sink_rows": dict(sorted(per_sink.items())),
    }


def write_metrics(out_dir: str) -> str:
    """Atomically write ``_metrics.json`` beside the outputs."""
    path = os.path.join(out_dir, "_metrics.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(job_metrics(out_dir), f, indent=1, sort_keys=True)
    os.rename(tmp, path)
    return path
