"""Resumable near-dedup job: e2e over a sharded corpus with cross-shard
duplicate clusters, same-spec resume, kill-resume idempotence, and
cluster-map invalidation when the input set changes."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from log_formatter_ray.pipelines.dedup_job import run_dedup_job


def _doc(i: int, words: int = 24) -> str:
    return " ".join(f"w{i}x{j}" for j in range(words))


def _write_shard(path: str, ids: list[int], texts: list[str]) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "extra": pa.array([f"e{i}" for i in ids]),
            }
        ),
        path,
    )


def _make_corpus(src: str) -> None:
    os.makedirs(src, exist_ok=True)
    # duplicate clusters SPAN shards: {0, 10, 20} and {5, 11}
    texts = {i: _doc(i) for i in range(30)}
    texts[10] = texts[0]
    texts[20] = texts[0]
    texts[11] = texts[5]
    for s in range(3):
        ids = list(range(s * 10, (s + 1) * 10))
        _write_shard(
            os.path.join(src, f"shard-{s:03d}.parquet"),
            ids, [texts[i] for i in ids],
        )


def _read_ids(out: str) -> list[int]:
    t = pq.read_table(os.path.join(out, "data"))
    return sorted(t["doc_id"].to_pylist())


def test_dedup_job_end_to_end_resume_and_kill(tmp_path):
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    _make_corpus(src)

    res = run_dedup_job(src, out, threshold=0.5)
    assert res.rows_in == 30
    assert res.n_dup_ids == 3  # 10, 20 (rep 0) and 11 (rep 5)
    assert res.rows_kept == 27 and res.rows_dropped == 3
    assert len(res.processed_partitions) == 3
    assert _read_ids(out) == sorted(set(range(30)) - {10, 11, 20})
    # full schema survives the rewrite
    t = pq.read_table(os.path.join(out, "data"))
    assert {"doc_id", "text", "extra"} <= set(t.column_names)

    # same-spec resume: stage A skipped (marker), no shard reprocessed
    res2 = run_dedup_job(src, out, threshold=0.5)
    assert res2.processed_partitions == []
    assert len(res2.skipped_partitions) == 3
    assert res2.rows_kept == 27

    # kill-resume: lose one shard's manifest + output; only it is redone
    # and the final corpus is identical
    before = pq.read_table(os.path.join(out, "data")).sort_by("doc_id")
    pid = res.processed_partitions[0]
    os.remove(os.path.join(out, "_manifests", f"{pid}.json"))
    shutil.rmtree(os.path.join(out, "data", f"part_id={pid}"))
    res3 = run_dedup_job(src, out, threshold=0.5)
    assert res3.processed_partitions == [pid]
    after = pq.read_table(os.path.join(out, "data")).sort_by("doc_id")
    cols = sorted(before.column_names)
    assert after.select(cols).equals(before.select(cols))


def test_dedup_job_new_shard_invalidates_cluster_map(tmp_path):
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    _make_corpus(src)
    run_dedup_job(src, out, threshold=0.5)

    # a NEW shard arrives containing a dup of an EXISTING doc: the cluster
    # map must be recomputed and every shard re-filtered under it (doc 30
    # duplicates doc 3, so 30 must be dropped; manifests from the old map
    # cannot certify the old shards any more)
    texts = {i: _doc(i) for i in (30, 31, 32)}
    texts[30] = _doc(3)
    _write_shard(
        os.path.join(src, "shard-003.parquet"),
        [30, 31, 32], [texts[i] for i in (30, 31, 32)],
    )
    res = run_dedup_job(src, out, threshold=0.5)
    assert len(res.processed_partitions) == 4  # ALL shards redone
    assert res.rows_in == 33
    assert res.n_dup_ids == 4  # 10, 11, 20, 30
    assert _read_ids(out) == sorted(set(range(33)) - {10, 11, 20, 30})


def test_dedup_job_big_drop_plan_matches_broadcast(tmp_path):
    """drop_broadcast_limit=0 forces the per-shard dropset semi-join plan
    (the duplicate ids never touch the driver); its output corpus must be
    identical to the broadcast plan's."""
    src = str(tmp_path / "in")
    _make_corpus(src)

    out_b = str(tmp_path / "out_broadcast")
    res_b = run_dedup_job(src, out_b, threshold=0.5)

    out_p = str(tmp_path / "out_partitioned")
    res_p = run_dedup_job(src, out_p, threshold=0.5, drop_broadcast_limit=0)

    assert res_p.n_dup_ids == res_b.n_dup_ids > 0
    assert res_p.rows_kept == res_b.rows_kept
    assert _read_ids(out_p) == _read_ids(out_b)
    # per-shard dropsets exist only for shards that actually lost rows
    t_b = pq.read_table(os.path.join(out_b, "data"))
    t_p = pq.read_table(os.path.join(out_p, "data"))
    assert t_p.sort_by("doc_id").equals(t_b.sort_by("doc_id"))
    assert os.path.isdir(os.path.join(out_p, "_dropsets"))

    # resume on the big plan: wipe one manifest, rerun, identical output
    mdir = os.path.join(out_p, "_manifests")
    victim = sorted(os.listdir(mdir))[0]
    os.remove(os.path.join(mdir, victim))
    res_r = run_dedup_job(src, out_p, threshold=0.5, drop_broadcast_limit=0)
    assert len(res_r.processed_partitions) == 1
    assert _read_ids(out_p) == _read_ids(out_b)


def test_dedup_job_light_lsh_shuffle_matches_default(tmp_path):
    """cluster_kwargs plumb the light LSH shuffle through the resumable
    job; output corpus identical to the default plan's."""
    src = str(tmp_path / "in")
    _make_corpus(src)
    out_a = str(tmp_path / "out_default")
    out_b = str(tmp_path / "out_light")
    res_a = run_dedup_job(src, out_a, threshold=0.5)
    res_b = run_dedup_job(
        src, out_b, threshold=0.5,
        cluster_kwargs={"shuffle_mode": "light"},
    )
    assert res_b.n_dup_ids == res_a.n_dup_ids > 0
    assert _read_ids(out_b) == _read_ids(out_a)
