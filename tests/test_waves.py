"""Wave-based incremental checkpointing: manifests land per wave, results
identical to a single-wave run."""

import glob

import pyarrow.parquet as pq

from log_formatter_ray.pipelines.flagship import run_flagship
from log_formatter_ray.state.manifest import load_manifests


def test_waves_identical_to_single_pass(corpus_dir, tmp_path):
    ref = run_flagship(corpus_dir, str(tmp_path / "ref"))
    waved = run_flagship(corpus_dir, str(tmp_path / "waved"), wave_size=1)
    assert waved.counts.equals(ref.counts)
    assert len(load_manifests(str(tmp_path / "waved"))) == 4
    a = pq.read_table(f"{tmp_path}/ref/data").sort_by("doc_id")
    b = pq.read_table(f"{tmp_path}/waved/data").sort_by("doc_id")
    cols = sorted(a.column_names)
    assert a.select(cols).equals(b.select(cols))


def test_partial_reduce_spill_path_identical(corpus_dir, tmp_path, monkeypatch):
    """VERDICT r4: above PARTIAL_REDUCE_LIMIT the per-wave partial reduce
    runs as a distributed Ray groupby — forcing the spill path must give
    byte-identical counts and manifests to the driver-pandas path."""
    import log_formatter_ray.pipelines.flagship as fl

    ref = run_flagship(corpus_dir, str(tmp_path / "ref"))
    monkeypatch.setattr(fl, "PARTIAL_REDUCE_LIMIT", 0)
    spilled = run_flagship(corpus_dir, str(tmp_path / "spill"))
    assert spilled.counts.equals(ref.counts)
    ms_ref = load_manifests(str(tmp_path / "ref"))
    ms_sp = load_manifests(str(tmp_path / "spill"))
    assert {p: m.sink_source_counts for p, m in ms_ref.items()} == {
        p: m.sink_source_counts for p, m in ms_sp.items()
    }
    assert {p: m.rows_in for p, m in ms_ref.items()} == {
        p: m.rows_in for p, m in ms_sp.items()
    }


def test_per_wave_metrics_and_hot_reload(corpus_dir, tmp_path):
    """_metrics.json refreshes after EVERY wave (heartbeat analog,
    manager.go:166-225) and reload_config swaps the routing rules at a
    wave boundary (hot-reload analog, manager.go:122-164): partitions of
    later waves carry the new rule-set's sinks in their manifests."""
    from log_formatter_ray.stages.route import Condition, RouteRule
    from log_formatter_ray.state.metrics import job_metrics

    out = str(tmp_path / "o")
    seen_progress = []
    new_rules = (
        RouteRule(sink="sink_quarantine", when=(Condition("_ok", "==", False),)),
        RouteRule(sink="sink_v2", when=(Condition("n_tok", ">=", 0),)),
    )
    calls = {"n": 0}

    def reload_config():
        # runs on the driver BETWEEN waves: observe the heartbeat artifact
        seen_progress.append(job_metrics(out)["partitions_done"])
        calls["n"] += 1
        if calls["n"] >= 3:  # flip the cascade before the 3rd wave
            return {"rules": new_rules}
        return None

    res = run_flagship(out_dir=out, input_path=corpus_dir, wave_size=1,
                       reload_config=reload_config)
    assert seen_progress == [0, 1, 2, 3]  # wave-accurate mid-run metrics
    # waves 1-2 used the built-in rules; waves 3-4 route everything ok → v2
    sinks_per_wave = [set(m.sink_counts) for m in
                      (res.manifests[p] for p in sorted(res.manifests))]
    v2 = [s for s in sinks_per_wave if "sink_v2" in s]
    old = [s for s in sinks_per_wave if "sink_premium" in s or "sink_standard" in s]
    assert len(v2) == 2 and len(old) == 2
    for s in v2:
        assert not ({"sink_premium", "sink_standard", "sink_long"} & s)
    # final metrics reflect the whole job
    assert job_metrics(out)["partitions_done"] == 4


def test_incremental_ingest_processes_only_new_files(tmp_path):
    """Kafka-consumption analog (kafka.go:182-186 at-least-once): new files
    appearing between runs are the only work the next run performs."""
    import os

    import pyarrow.parquet as pq2

    from log_formatter_ray.fixtures import make_sequences_batch
    from log_formatter_ray.pipelines.flagship import ingest

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        pq2.write_table(
            make_sequences_batch(500, start_row=i * 500),
            str(src / f"part-{i:05d}.parquet"),
        )
    out = str(tmp_path / "out")
    first = ingest(str(src), out)
    assert len(first.processed_partitions) == 3 and first.rows_in == 1500
    # two new files arrive
    for i in range(3, 5):
        pq2.write_table(
            make_sequences_batch(500, start_row=i * 500),
            str(src / f"part-{i:05d}.parquet"),
        )
    second = ingest(str(src), out)
    assert len(second.processed_partitions) == 2  # ONLY the new arrivals
    assert len(second.skipped_partitions) == 3
    assert second.rows_in == 2500  # totals span all manifests
    # previously-written outputs were not touched (effectively-once)
    total = pq2.read_table(os.path.join(out, "data")).num_rows
    assert total == 2500


def test_poll_ingest_reprocesses_only_new_arrivals(tmp_path):
    """The ES-input retry-timer analog (elasticsearch.go:104-178): each
    poll is one bounded ingest pass that costs only the files that landed
    since the previous poll."""
    import threading

    import pyarrow.parquet as pq2

    from log_formatter_ray.fixtures import make_sequences_batch
    from log_formatter_ray.pipelines.flagship import poll_ingest

    src = tmp_path / "in"
    src.mkdir()
    for i in range(2):
        pq2.write_table(
            make_sequences_batch(300, start_row=i * 300),
            str(src / f"part-{i:05d}.parquet"),
        )
    out = str(tmp_path / "out")

    def on_result(res):
        if len(res.skipped_partitions) == 0:  # after the FIRST poll only
            for i in range(2, 4):
                pq2.write_table(
                    make_sequences_batch(300, start_row=i * 300),
                    str(src / f"part-{i:05d}.parquet"),
                )

    results = poll_ingest(
        str(src), out, interval_s=0.01, max_polls=2, on_result=on_result
    )
    assert len(results) == 2
    assert len(results[0].processed_partitions) == 2
    assert len(results[1].processed_partitions) == 2  # only the arrivals
    assert len(results[1].skipped_partitions) == 2
    assert results[1].rows_in == 1200  # totals span all manifests

    # drain path: a pre-set stop event finishes the current pass, then exits
    ev = threading.Event()
    ev.set()
    drained = poll_ingest(str(src), out, interval_s=60.0, stop=ev)
    assert len(drained) == 1 and len(drained[0].processed_partitions) == 0


def test_wave_resume_skips_completed_waves(corpus_dir, tmp_path):
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "o")
    # first wave only (2 of 4 partitions), as if the job died after wave 1
    partial = run_flagship(files[:2], out, wave_size=2)
    assert len(partial.manifests) == 2
    # resume with full input: only the remaining partitions processed
    res = run_flagship(corpus_dir, out, wave_size=2)
    assert len(res.processed_partitions) == 2
    assert sorted(res.skipped_partitions) == sorted(partial.manifests)
    assert res.rows_in == 5000
