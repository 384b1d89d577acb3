"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the embedding space,
then mark documents whose embeddings are near-identical (cosine ≥
threshold) WITHIN each cluster as semantic duplicates.  Clustering
first makes the quadratic step tractable: the all-pairs comparison runs
only inside a k-means cluster, never across the corpus.

No counterpart exists in the reference engine (see COVERAGE.md
"Training-data operators").  Ray-Data-first plan:

- centroids fit once on a deterministic hash-reservoir sample
  (:class:`~log_formatter_ray.ops.ann.IVFIndex` — layout-independent),
  broadcast via ``ray.put``; assignment is one vectorized matmul per
  batch;
- one keyed shuffle on ``hash(cluster) % coarse`` ships each vector
  exactly once (every k-means cluster lands whole in one partition —
  the partitioning assumption the within-cluster comparison relies on);
- per partition: blocked gram matrix per cluster (``block`` rows at a
  time, memory-bounded), cosine-≥-threshold edges, then vectorized
  min-label propagation to components (duplicate groups are near-crisp
  cliques — label propagation converges in ~2 rounds);
- output ``(id, rep)`` for components of size ≥ 2, ``rep`` = min id —
  the :func:`~log_formatter_ray.ops.dedup.minhash_lsh_clusters`
  contract, so ``dedup_by_clusters`` / ``elect_cluster_reps`` compose
  unchanged downstream.

``max_cluster`` caps the quadratic step on degenerate clusters (excess
members are dropped from comparison and logged), exactly like the LSH
``max_bucket`` cap.

At-rest alternative for very large corpora: the one keyed shuffle here
ships every raw vector once (~3 KB/row at 768 float32 dims).  When the
corpus already lives in parquet, ``IVFIndex.write_partitioned`` lays it
out hive-partitioned by the same cluster id — then
:func:`semdedup_clusters_partitioned` runs the identical comparison per
``cluster=`` directory with NO online shuffle at all (each directory is
one partition of this op by construction; result parity pinned by
test).  Shuffle bytes can also be quartered with
``ann.quantize_embeddings`` int8 vectors at a small cosine-threshold
tolerance cost.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from log_formatter_ray.ops._shuffle import PART_COL, hash_part
from log_formatter_ray.ops.ann import IVFIndex, _as_matrix, _normalize

logger = logging.getLogger("log_formatter_ray")


def _components_min_label(n: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min-label propagation over an edge list: ``labels[i]`` = smallest
    node index in i's component.  All-numpy; rounds ~ component
    diameter (cliques: 1-2)."""
    labels = np.arange(n, dtype=np.int64)
    while True:
        nxt = labels.copy()
        if a.size:
            np.minimum.at(nxt, a, labels[b])
            np.minimum.at(nxt, b, labels[a])
        nxt = nxt[nxt]  # pointer-jump compression
        if np.array_equal(nxt, labels):
            return labels
        labels = nxt


def semdedup_clusters(
    ds,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    threshold: float = 0.95,
    iters: int = 10,
    seed: int = 42,
    sample_rows: int = 10_000,
    coarse: int = 64,
    max_cluster: int = 100_000,
    block: int = 1024,
    index: IVFIndex | None = None,
):
    """Semantic near-dup groups → Dataset ``(id, rep)`` for docs in
    groups of size ≥ 2 (``rep`` = min id), sorted by id.  See the module
    docstring for the plan and the partitioning assumption.  Pass a
    prefitted ``index`` to share centroids with an at-rest layout
    (:func:`semdedup_clusters_partitioned`)."""
    idx = index or IVFIndex(
        n_clusters=n_clusters, iters=iters, seed=seed
    ).fit(ds, emb_col=emb_col, id_col=id_col, sample_rows=sample_rows)
    assigned = idx.assign(
        ds.select_columns([id_col, emb_col]), emb_col=emb_col
    )

    def tag(batch: pa.Table) -> pa.Table:
        cl = batch["cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            PART_COL, pa.array(hash_part(cl, coarse))
        )

    keyed = assigned.map_batches(
        tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def dedup_part(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("cluster", "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        ids = g[id_col].combine_chunks()
        cl = g["cluster"].combine_chunks().to_numpy(zero_copy_only=False)
        V = _normalize(_as_matrix(g[emb_col], len(g)).astype(np.float64))
        return _dedup_sorted(ids, cl, V, threshold, max_cluster, block)

    return (
        keyed.groupby(PART_COL)
        .map_groups(dedup_part, batch_format="pyarrow")
        .sort("id")
    )


def _dedup_sorted(ids, cl: np.ndarray, V: np.ndarray, threshold: float,
                  max_cluster: int, block: int) -> pa.Table:
    """(id, rep) duplicate groups over rows SORTED by (cluster, id):
    blocked gram per cluster run + min-label propagation.  The shared
    kernel of the shuffled and at-rest plans."""
    n = len(ids)
    bounds = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1], True])
    ea, eb = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        m = int(e - s)
        if m < 2:
            continue
        if m > max_cluster:
            logger.warning(
                "semdedup: cluster %d capped at %d members (had %d)",
                int(cl[s]), max_cluster, m,
            )
            e = s + max_cluster
            m = max_cluster
        W = V[s:e]
        for b0 in range(0, m, block):
            S = W[b0:b0 + block] @ W.T
            bi, bj = np.nonzero(S >= threshold)
            gi = bi + b0
            keep = gi < bj  # strict upper triangle
            if keep.any():
                ea.append(gi[keep] + s)
                eb.append(bj[keep] + s)
    a = np.concatenate(ea) if ea else np.empty(0, np.int64)
    b = np.concatenate(eb) if eb else np.empty(0, np.int64)
    labels = _components_min_label(n, a, b)
    sizes = np.bincount(labels, minlength=n)
    member = sizes[labels] >= 2
    sel = pa.array(np.flatnonzero(member))
    return pa.table({
        "id": ids.take(sel),
        "rep": ids.take(pa.array(labels[member])),
    })


def semdedup_clusters_partitioned(
    path: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_cluster: int = 100_000,
    block: int = 1024,
):
    """SemDeDup over an AT-REST IVF layout with NO online shuffle: the
    corpus was written hive-partitioned by cluster id
    (``IVFIndex.write_partitioned`` → ``path/cluster=<c>/``), so each
    ``cluster=`` directory already IS one partition of the within-cluster
    comparison.  One Ray task per directory reads only that directory
    and runs the shared kernel — zero bytes move between workers.

    Same output contract as :func:`semdedup_clusters`; identical results
    when both use the same fitted index (pinned by test)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    dirs = sorted(
        d for d in os.listdir(path)
        if d.startswith("cluster=")
        and os.path.isdir(os.path.join(path, d))
    )

    def dedup_dir(batch: pa.Table) -> pa.Table:
        outs = []
        for d in batch["dir"].to_pylist():
            t = pq.read_table(
                os.path.join(path, d), columns=[id_col, emb_col]
            )
            t = t.take(pc.sort_indices(t, sort_keys=[(id_col, "ascending")]))
            ids = t[id_col].combine_chunks()
            V = _normalize(_as_matrix(t[emb_col], len(t)).astype(np.float64))
            outs.append(_dedup_sorted(
                ids, np.zeros(len(t), np.int32), V, threshold,
                max_cluster, block,
            ))
        return pa.concat_tables(outs)

    return (
        rd.from_arrow(pa.table({"dir": pa.array(dirs, pa.string())}))
        .map_batches(dedup_dir, batch_format="pyarrow", batch_size=1)
        .sort("id")
    )
