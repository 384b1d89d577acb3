"""Checkpoint/resume: kill-and-rerun produces identical outputs and skips
finished partitions (SURVEY.md §4 explicit design; FIXTURES.md §6.6)."""

import glob
import os

import pyarrow.parquet as pq

from log_formatter_ray.pipelines.flagship import run_flagship
from log_formatter_ray.state.manifest import load_manifests, part_id_for_file


def _sink_content_fingerprint(out_dir: str):
    """Order-insensitive content summary: doc_id → (sink, token hash proxy)."""
    t = pq.read_table(f"{out_dir}/data", columns=["doc_id", "n_tok", "sink"])
    return dict(
        zip(
            t["doc_id"].to_pylist(),
            zip(t["sink"].to_pylist(), t["n_tok"].to_pylist()),
        )
    )


def test_resume_after_partial_run(corpus_dir, tmp_path):
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))

    # reference run: everything in one go
    ref_out = str(tmp_path / "ref")
    ref = run_flagship(corpus_dir, ref_out)

    # simulated interrupted run: only 2 of 4 shards completed...
    out = str(tmp_path / "resumed")
    partial = run_flagship(files[:2], out)
    assert len(partial.manifests) == 2

    # ...plus a torn partial write of a third partition (no manifest)
    torn_pid = part_id_for_file(files[2])
    torn_dir = os.path.join(out, "data", f"part_id={torn_pid}", "sink=sink_standard")
    os.makedirs(torn_dir, exist_ok=True)
    with open(os.path.join(torn_dir, "junk.parquet"), "w") as f:
        f.write("not parquet")

    done_before = {
        pid: os.path.getmtime(os.path.join(out, "_manifests", f"{pid}.json"))
        for pid in partial.manifests
    }

    # resume over the full input
    res = run_flagship(corpus_dir, out)
    assert sorted(res.skipped_partitions) == sorted(partial.manifests)
    assert len(res.processed_partitions) == 2
    assert torn_pid in res.processed_partitions

    # finished partitions were not rewritten
    for pid, mtime in done_before.items():
        assert os.path.getmtime(os.path.join(out, "_manifests", f"{pid}.json")) == mtime

    # byte-identical result vs the uninterrupted run
    assert res.counts.equals(ref.counts)
    assert _sink_content_fingerprint(out) == _sink_content_fingerprint(ref_out)
    assert res.rows_in == ref.rows_in == 5000


def test_resume_noop_when_complete(corpus_dir, tmp_path):
    out = str(tmp_path / "o")
    first = run_flagship(corpus_dir, out)
    again = run_flagship(corpus_dir, out)
    assert again.processed_partitions == []
    assert again.counts.equals(first.counts)
    assert len(load_manifests(out)) == 4
