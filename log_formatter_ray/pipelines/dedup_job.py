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
  near-dup assumption) reaches the filter by one of two plans chosen by
  cluster-map size: broadcast once (≤ ``drop_broadcast_limit``), or — at
  scale — a distributed semi-join that writes PER-SHARD drop lists under
  ``_dropsets/`` (only id columns shuffle; the dup ids never touch the
  driver).  Pending shards then stream through one Ray job: read →
  part_id tag → vectorized drop-filter → per-partition parquet write
  (content-hashed filenames → retried tasks overwrite their own files).
  One atomic lineage manifest per shard; resume = skip manifested shards,
  clean and redo the rest.  Kill the job at any point and rerun: stage A
  is skipped, only unmanifested shards are reprocessed.

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


def _count_dup_ids(clusters_dir: str) -> int:
    """Distributed count of cluster members that are not their own rep —
    the driver sees one integer, never the ids."""
    from log_formatter_ray.sources import clean

    n = clean(rd.read_parquet(clusters_dir)).map_batches(
        lambda t: pa.table(
            {"n": pa.array(
                [len(t.filter(pc.invert(pc.equal(t["id"], t["rep"]))))],
                pa.int64(),
            )}
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).sum("n")
    return int(n or 0)


def _build_dropsets(
    clusters_dir: str,
    dropsets_dir: str,
    pending_files: list[str],
    id_col: str,
    coarse: int | None = None,
) -> None:
    """Per-shard drop lists without the drop set ever touching the driver.

    One hash-partitioned semi-join: the pending shards' (part_id, id)
    columns (ids only — the payload never shuffles) union with the cluster
    map's duplicate ids, co-partitioned on ``hash(id) % coarse``; each
    partition emits the (part_id, id) pairs present in its drop ids, and
    the result lands as ``dropsets_dir/part_id=<pid>/`` parquet.  The
    rewrite stage then loads only its own shard's list — worker memory is
    bounded by ONE shard's duplicate ids."""
    import numpy as np

    from log_formatter_ray.ops._shuffle import PART_COL, hash_part
    from log_formatter_ray.pipelines.flagship import _basename_tagger
    from log_formatter_ray.sources import clean

    shutil.rmtree(dropsets_dir, ignore_errors=True)
    os.makedirs(dropsets_dir, exist_ok=True)
    n_cluster_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(clusters_dir, "*.parquet"))
    )
    if coarse is None:
        coarse = int(min(4096, max(64, n_cluster_rows // 100_000)))

    corpus_ids = clean(
        rd.read_parquet_bulk(pending_files, columns=[id_col], include_paths=True)
    ).map_batches(
        _basename_tagger(pending_files), batch_format="pyarrow", batch_size=None
    )

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        return pa.table(
            {
                "part_id": t["part_id"].combine_chunks(),
                "id": ids,
                "_slot": pa.array(np.ones(len(t), np.int8)),
                PART_COL: pa.array(
                    hash_part(ids.to_numpy(zero_copy_only=False), coarse)
                ),
            }
        )

    def tag_drop(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.invert(pc.equal(t["id"], t["rep"])))
        ids = sub["id"].combine_chunks()
        return pa.table(
            {
                "part_id": pa.nulls(len(sub), pa.string()),
                "id": ids,
                "_slot": pa.array(np.zeros(len(sub), np.int8)),
                PART_COL: pa.array(
                    hash_part(ids.to_numpy(zero_copy_only=False), coarse)
                ),
            }
        )

    unioned = corpus_ids.map_batches(
        tag_corpus, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).union(
        clean(rd.read_parquet(clusters_dir)).map_batches(
            tag_drop, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    )

    def semi(group: pa.Table) -> pa.Table:
        slot = group["_slot"]
        drop_ids = group.filter(pc.equal(slot, 0))["id"]
        rows = group.filter(pc.equal(slot, 1))
        if not len(drop_ids) or not len(rows):
            return rows.slice(0, 0).select(["part_id", "id"])
        hit = rows.filter(
            pc.is_in(
                rows["id"], value_set=pc.unique(drop_ids.combine_chunks())
            )
        )
        return hit.select(["part_id", "id"])

    unioned.groupby(PART_COL).map_groups(
        semi, batch_format="pyarrow"
    ).write_parquet(dropsets_dir, partition_cols=["part_id"])


class _FilterAndWrite:
    """Fused drop-filter + per-partition parquet write + partial counts.

    Per batch: drop rows whose id is in the duplicate set — either the
    broadcast array (small plan) or the shard's own drop list loaded
    lazily from ``dropsets_dir/part_id=<pid>/`` and cached per worker
    (big plan) — write one parquet file per part_id slice under
    ``data/part_id=<pid>/``, and return ONLY (part_id, rows_in,
    rows_kept) partials — kilobytes per block, the corpus never crosses
    an operator boundary (the flagship's RouteAndWrite pattern,
    flagship.py:115-200)."""

    def __init__(self, drop_ref, data_dir: str, id_col: str,
                 dropsets_dir: str | None = None):
        self.drop_ref = drop_ref
        self.data_dir = data_dir
        self.id_col = id_col
        self.dropsets_dir = dropsets_dir
        self._dropset_cache: dict = {}

    def _dropset_for(self, pid: str):
        """The shard's drop-id array (or None), cached per worker."""
        if pid not in self._dropset_cache:
            arr = None
            d = os.path.join(self.dropsets_dir, f"part_id={pid}")
            if os.path.isdir(d):
                t = pq.read_table(d, columns=["id"])
                if len(t):
                    arr = t["id"].combine_chunks()
            self._dropset_cache[pid] = arr
        return self._dropset_cache[pid]

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
        elif self.dropsets_dir is not None:
            # per-pid drop lists; batches are per-shard slices in practice
            dict_pid = pc.dictionary_encode(batch["part_id"])
            if isinstance(dict_pid, pa.ChunkedArray):
                dict_pid = dict_pid.combine_chunks()
            codes_np = dict_pid.indices.to_numpy(zero_copy_only=False)
            keep_np = np.ones(len(batch), dtype=bool)
            for ci, pid in enumerate(dict_pid.dictionary.to_pylist()):
                drop = self._dropset_for(pid)
                if drop is None:
                    continue
                sel = codes_np == ci
                sub = batch[self.id_col].combine_chunks().take(
                    pa.array(np.flatnonzero(sel))
                )
                hit = pc.is_in(sub, value_set=drop).to_numpy(
                    zero_copy_only=False
                )
                keep_np[np.flatnonzero(sel)[np.asarray(hit, bool)]] = False
            keep_mask = pa.array(keep_np)
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
    drop_broadcast_limit: int = 5_000_000,
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

    # cluster-map size from parquet FOOTERS only — the plan choice must not
    # require materializing a potentially-billion-row map on the driver
    n_cluster_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(clusters_dir, "*.parquet"))
    )

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

    # ---- drop-set plan, chosen by cluster-map size -----------------------
    # * small (≤ drop_broadcast_limit cluster rows): driver reads the map,
    #   broadcasts the duplicate-id array once — no extra pass.
    # * big: the duplicate ids never touch the driver.  ONE distributed
    #   semi-join shuffles only the pending shards' (part_id, id) columns
    #   against the cluster Dataset (hash(id)-partitioned) and writes a
    #   PER-SHARD drop list under out_dir/_dropsets/part_id=<pid>/; the
    #   rewrite then loads only its own shard's list.  The corpus payload
    #   never shuffles, per-task memory is bounded by one shard's ids, and
    #   the shard-granular manifest/resume contract is untouched.
    drop_ref = None
    dropsets_dir = None
    if n_cluster_rows <= drop_broadcast_limit:
        ct = pq.read_table(clusters_dir)  # (id, rep): sparse by assumption
        dup_ids = ct.filter(pc.invert(pc.equal(ct["id"], ct["rep"])))[
            "id"
        ].combine_chunks()
        n_dup_ids = len(dup_ids)
        drop_ref = ray.put(dup_ids) if len(dup_ids) else None
    else:
        n_dup_ids = _count_dup_ids(clusters_dir)
        if pending:
            dropsets_dir = os.path.join(out_dir, "_dropsets")
            _build_dropsets(
                clusters_dir, dropsets_dir,
                sorted(f for fs in pending.values() for f in fs),
                id_col,
            )

    if pending:
        from log_formatter_ray.pipelines.flagship import _basename_tagger

        from log_formatter_ray.sources import clean

        pfiles = sorted(f for fs in pending.values() for f in fs)
        ds = clean(rd.read_parquet_bulk(pfiles, include_paths=True))
        ds = ds.map_batches(
            _basename_tagger(pfiles), batch_format="pyarrow", batch_size=None
        )
        partials = ds.map_batches(
            _FilterAndWrite(drop_ref, data_dir, id_col, dropsets_dir),
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
        n_clustered_docs=n_cluster_rows,
        n_dup_ids=n_dup_ids,
        rows_in=rows_in,
        rows_kept=rows_kept,
        rows_dropped=rows_in - rows_kept,
        processed_partitions=sorted(pending),
        skipped_partitions=sorted(set(done) - set(pending)),
    )
