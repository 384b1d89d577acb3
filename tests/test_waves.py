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
