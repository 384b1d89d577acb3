"""The driver's bench contract: ``python bench.py`` prints ONE JSON
line with the agreed keys.  Run as a subprocess (bench owns its Ray
session) over sf0.001 with a two-query subset so the test stays fast."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line_with_contract_keys():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        GRAFT_BENCH_QUERIES="gopher_filter_documents,heavy_hitters_users",
    )
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines  # ONE JSON line on stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus"):
        assert key in rec, key
    assert rec["unit"] == "sec"
    assert rec["num_cpus"] == 4
    assert set(rec["queries"]) == {
        "gopher_filter_documents", "heavy_hitters_users"
    }
    assert all(isinstance(v, (int, float)) for v in rec["queries"].values())
