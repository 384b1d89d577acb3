"""Resumable near-duplicate dedup JOB: dedup a sharded corpus and write
the deduplicated corpus back, with the flagship's checkpoint/resume
contract (state/manifest.py) — the 100-TB shape of "run MinHash dedup over
the crawl and keep the survivors".

Two stages, each independently resumable:

* **Stage A — global clusters (one checkpoint).**  Near-dup clustering is
  corpus-global by nature (a pair can span any two shards), so it runs
  once as the fully-distributed ``minhash_lsh_clusters`` plan and its
  (id, rep) result is persisted to ``out_dir/_clusters/`` with a marker
  keyed by the job spec (threshold, columns, input basenames, knobs) — a
  rerun with the same spec skips straight past it; changing the spec
  recomputes.
* **Stage B — shard-granular filtered rewrite (manifest-gated).**  The
  duplicate-id set (cluster members minus representatives — sparse by the
  near-dup assumption) is broadcast once, and pending shards stream
  through one Ray job: read → part_id tag → vectorized drop-filter →
  per-partition parquet write (content-hashed filenames → retried tasks
  overwrite their own files).  One atomic lineage manifest per shard;
  resume = skip manifested shards, clean and redo the rest.  Kill the job
  at any point and rerun: stage A is skipped, only unmanifested shards
  are reprocessed.

The reference has no dedup (SURVEY §2 — this is training-data surface);
the job wrapper mirrors agent.go's run-loop role for the flagship
(/root/reference/agent.go:30-47).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from log_formatter_ray.ops.dedup import minhash_lsh_clusters
from log_formatter_ray.state.manifest import (
    PartitionManifest,
    assign_partitions,
    clean_partition_output,
    load_manifests,
    manifest_dir,
    write_manifest,
)


@dataclass
class DedupJobResult:
    clusters_path: str
    n_clustered_docs: int
    n_dup_ids: int
    rows_in: int
    rows_kept: int
    rows_dropped: int
    processed_partitions: list[str] = field(default_factory=list)
    skipped_partitions: list[str] = field(default_factory=list)


class _FilterAndWrite:
    """Fused drop-filter + per-partition parquet write + partial counts.

    Per batch: drop rows whose id is in the broadcast duplicate set, write
    one parquet file per part_id slice under ``data/part_id=<pid>/``, and
    return ONLY (part_id, rows_in, rows_kept) partials — kilobytes per
    block, the corpus never crosses an operator boundary (the flagship's
    RouteAndWrite pattern, flagship.py:115-200)."""

    def __init__(self, drop_ref, data_dir: str, id_col: str):
        self.drop_ref = drop_ref
        self.data_dir = data_dir
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        empty = pa.table(
            {
                "part_id": pa.array([], pa.string()),
                "rows_in": pa.array([], pa.int64()),
                "rows_kept": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        if self.drop_ref is not None:
            keep_mask = pc.invert(
                pc.is_in(batch[self.id_col], value_set=ray.get(self.drop_ref))
            )
        else:
            keep_mask = pa.array(np.ones(len(batch), dtype=bool))

        # group by part_id with ONE stable argsort + contiguous slices
        dict_arr = pc.dictionary_encode(batch["part_id"])
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        pids = dict_arr.dictionary
        if len(pids) > 1:
            order = np.argsort(codes, kind="stable")
            batch = batch.take(pa.array(order))
            keep_mask = keep_mask.take(pa.array(order))
            codes = codes[order]
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, len(codes)]
        out_pid, out_in, out_kept = [], [], []
        for s, e in zip(starts, ends):
            pid = pids[int(codes[s])].as_py()
            sub = batch.slice(s, e - s)
            kept = sub.filter(keep_mask.slice(s, e - s))
            if len(kept):
                d = os.path.join(self.data_dir, f"part_id={pid}")
                os.makedirs(d, exist_ok=True)
                first = kept[self.id_col][0].as_py()
                last = kept[self.id_col][len(kept) - 1].as_py()
                name = hashlib.sha1(
                    f"{pid}|{first}|{last}|{len(kept)}".encode()
                ).hexdigest()[:16]
                pq.write_table(
                    kept.drop_columns(["part_id"]),
                    os.path.join(d, f"{name}.parquet"),
                )
            out_pid.append(pid)
            out_in.append(e - s)
            out_kept.append(len(kept))
        return pa.table(
            {
                "part_id": pa.array(out_pid, pa.string()),
                "rows_in": pa.array(out_in, pa.int64()),
                "rows_kept": pa.array(out_kept, pa.int64()),
            }
        )


def run_dedup_job(
    input_path: str | list[str],
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    resume: bool = True,
    cluster_kwargs: dict | None = None,
) -> DedupJobResult:
    """Run (or resume) the near-dedup job.  Ray must already be initialised.

    Output: ``out_dir/data/part_id=<pid>/*.parquet`` (the deduplicated
    corpus, same schema as the input), ``out_dir/_clusters/`` (the (id,
    rep) cluster map), one manifest per input shard.
    """
    if isinstance(input_path, str):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = sorted(input_path)
    if not files:
        raise ValueError(f"no parquet inputs under {input_path!r}")
    cluster_kwargs = dict(cluster_kwargs or {})

    # ---- Stage A: global clusters, one spec-keyed checkpoint -------------
    clusters_dir = os.path.join(out_dir, "_clusters")
    spec = json.dumps(
        {
            "threshold": threshold,
            "text_col": text_col,
            "id_col": id_col,
            "files": [os.path.basename(f) for f in files],
            "kwargs": {k: repr(v) for k, v in sorted(cluster_kwargs.items())},
        },
        sort_keys=True,
    )
    marker = os.path.join(
        clusters_dir, "_DONE_" + hashlib.sha1(spec.encode()).hexdigest()[:12]
    )
    cluster_map_recomputed = not (resume and os.path.exists(marker))
    if cluster_map_recomputed:
        shutil.rmtree(clusters_dir, ignore_errors=True)
        os.makedirs(clusters_dir, exist_ok=True)
        from log_formatter_ray.sources import clean

        ds = clean(rd.read_parquet_bulk(files, columns=[id_col, text_col]))
        clusters = minhash_lsh_clusters(
            ds, text_col=text_col, id_col=id_col, threshold=threshold,
            **cluster_kwargs,
        )
        clusters.write_parquet(clusters_dir)
        with open(marker, "w") as f:
            f.write(spec)

    ct = pq.read_table(clusters_dir)  # (id, rep): sparse by the near-dup
    dup_ids = ct.filter(pc.invert(pc.equal(ct["id"], ct["rep"])))[
        "id"
    ].combine_chunks()
    drop_ref = ray.put(dup_ids) if len(dup_ids) else None

    # ---- Stage B: shard-granular filtered rewrite ------------------------
    parts = assign_partitions(files)
    done = load_manifests(out_dir) if resume else {}
    data_dir = os.path.join(out_dir, "data")
    if cluster_map_recomputed and done:
        # a manifest certifies a shard's output UNDER ONE cluster map —
        # a recomputed map (changed inputs/spec) invalidates them all; a
        # plain same-spec resume never reaches this branch
        for pid in list(done):
            stale = os.path.join(manifest_dir(out_dir), f"{pid}.json")
            if os.path.exists(stale):
                os.remove(stale)
            clean_partition_output(data_dir, pid)
        done = {}
    for pid in list(done):  # stale manifests (inputs changed)
        if pid not in parts:
            del done[pid]
            stale = os.path.join(manifest_dir(out_dir), f"{pid}.json")
            if os.path.exists(stale):
                os.remove(stale)
            clean_partition_output(data_dir, pid)
    pending = {pid: fs for pid, fs in parts.items() if pid not in done}
    for pid in pending:
        clean_partition_output(data_dir, pid)

    if pending:
        from log_formatter_ray.pipelines.flagship import _basename_tagger

        from log_formatter_ray.sources import clean

        pfiles = sorted(f for fs in pending.values() for f in fs)
        ds = clean(rd.read_parquet_bulk(pfiles, include_paths=True))
        ds = ds.map_batches(
            _basename_tagger(pfiles), batch_format="pyarrow", batch_size=None
        )
        partials = ds.map_batches(
            _FilterAndWrite(drop_ref, data_dir, id_col),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).to_pandas()
        agg = (
            partials.groupby("part_id", as_index=False)[["rows_in", "rows_kept"]]
            .sum()
            .set_index("part_id")
        )
        for pid, fs in pending.items():
            rows_in = int(agg["rows_in"].get(pid, 0))
            rows_kept = int(agg["rows_kept"].get(pid, 0))
            m = PartitionManifest(
                part_id=pid,
                input_files=[os.path.basename(f) for f in fs],
                rows_in=rows_in,
                rows_routed=rows_kept,
                rows_dropped=rows_in - rows_kept,
                sink_counts={"kept": rows_kept},
            )
            write_manifest(out_dir, m)
            done[pid] = m

    rows_in = sum(m.rows_in for m in done.values())
    rows_kept = sum(m.rows_routed for m in done.values())
    return DedupJobResult(
        clusters_path=clusters_dir,
        n_clustered_docs=len(ct),
        n_dup_ids=len(dup_ids),
        rows_in=rows_in,
        rows_kept=rows_kept,
        rows_dropped=rows_in - rows_kept,
        processed_partitions=sorted(pending),
        skipped_partitions=sorted(set(done) - set(pending)),
    )
