"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a numpy matmul against it and
  emits only its LOCAL top-k per query (k rows per query per batch — the
  partial-aggregation pattern), and the driver merges the tiny partials.
  The corpus streams; nothing shuffles.
* ``IVFIndex`` — the scale path: k-means centroids fit on a sample,
  cluster id assigned per row in one vectorized pass, searches probe only
  ``nprobe`` clusters (a broadcast cluster-id filter), then brute-force
  within the probed subset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _as_matrix(emb_chunked, n: int) -> np.ndarray:
    emb = emb_chunked.combine_chunks()
    flat = np.asarray(emb.flatten(), dtype=np.float32)
    return flat.reshape(n, flat.size // n)


def _normalize(V: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return V / norms


class _PartialTopK:
    """Per-batch local top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, emb_col: str, id_col: str):
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col
        self.Q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        V = _normalize(_as_matrix(batch[self.emb_col], n).astype(np.float64))
        S = V @ self.Q.T  # (n, q)
        ids = np.asarray(batch[self.id_col])
        k = min(self.k, n)
        out_rows, out_q = [], []
        for q in range(self.Q.shape[0]):
            # deterministic (-cos, id) order even among cosine ties —
            # argpartition at the cut would keep an arbitrary tied subset
            order = np.lexsort((ids, -S[:, q]))[:k]
            out_rows.append(order)
            out_q.append(np.full(k, q, np.int32))
        rows = np.concatenate(out_rows)
        q_idx = np.concatenate(out_q)
        return pa.table(
            {
                "query_idx": pa.array(q_idx),
                self.id_col: pa.array(ids[rows]),
                "cos": pa.array(S[rows, q_idx], pa.float64()),
            }
        )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency=(1, 8),
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k → DataFrame (query_idx, id, cos, rank).

    Deterministic tie-break: (-cos, id).
    """
    queries = np.atleast_2d(queries)
    qref = ray.put(queries)
    # over-fetch so post-hoc exclusion can never displace a true top-k hit
    k_local = k + (len(exclude_ids) if exclude_ids else 0)

    def refine(t: pa.Table) -> pa.Table:
        # second distributed top-k level: the driver merge stays
        # O(partitions × queries × k) regardless of block count (exact —
        # top-k of per-block top-k's is the global top-k)
        q_idx = np.asarray(t["query_idx"])
        cos = np.asarray(t["cos"])
        ids = np.asarray(t[id_col])
        order = np.lexsort((ids, -cos, q_idx))
        starts = np.flatnonzero(np.r_[True, q_idx[order][1:] != q_idx[order][:-1]])
        rank = np.arange(len(order)) - np.repeat(
            starts, np.diff(np.r_[starts, len(order)])
        )
        return t.take(pa.array(order[rank < k_local]))

    partials = (
        ds.map_batches(
            _PartialTopK,
            fn_constructor_args=(qref, k_local, emb_col, id_col),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
        )
        .repartition(8)
        .map_batches(refine, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .to_pandas()
    )
    if exclude_ids:
        partials = partials[~partials[id_col].isin(exclude_ids)]
    out = (
        partials.sort_values(["query_idx", "cos", id_col], ascending=[True, False, True])
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_idx").cumcount() + 1
    return out


def quantize_embeddings(
    batch: pa.Table, emb_col: str = "embedding",
    out_col: str = "embedding_q8", scale_col: str = "q_scale",
) -> pa.Table:
    """Symmetric per-vector int8 quantization: q = ⌊v/scale + 0.5⌋ clipped
    to ±127, scale = max|v| / 127 — 4× smaller embeddings for ANN at rest;
    dequant error bounded by scale/2 per component.

    All arithmetic is float64 with explicit round-half-up (⌊x+0.5⌋) so the
    DuckDB oracle (double math, FLOOR) reproduces it bit-for-bit — numpy's
    default banker's rounding would diverge on exact halves."""
    n = len(batch)
    V = _as_matrix(batch[emb_col], n).astype(np.float64)
    amax = np.abs(V).max(axis=1, keepdims=True)
    amax[amax == 0] = 1.0
    scale = amax / 127.0
    Q = np.clip(np.floor(V / scale + 0.5), -127, 127).astype(np.int8)
    dim = V.shape[1]
    q_arr = pa.FixedSizeListArray.from_arrays(pa.array(Q.reshape(-1)), dim)
    batch = batch.append_column(out_col, q_arr)
    return batch.append_column(scale_col, pa.array(scale.reshape(-1), pa.float64()))


def dequantize(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale.reshape(-1, 1)


class IVFIndex:
    """IVF (inverted-file) ANN: k-means buckets + nprobe search.

    Partitioning assumption: cluster ids are assigned with the SAME fitted
    centroids everywhere (broadcast); the assignment column can be used as a
    ``write_parquet(partition_cols=["cluster"])`` layout so searches read
    only the probed partitions at rest.
    """

    def __init__(self, n_clusters: int = 16, iters: int = 10, seed: int = 42):
        self.n_clusters = n_clusters
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, ds, emb_col: str = "embedding", id_col: str = "vec_id",
            sample_rows: int = 10_000) -> "IVFIndex":
        """Lloyd's k-means on a driver-side sample (sample ≪ corpus).

        The sample is the deterministic hash-reservoir
        (``reservoir_top_hash``): uniform over the WHOLE corpus regardless
        of file layout — a ``limit()`` sample would train centroids on the
        first blocks only, silently degrading recall on a corpus laid out
        by source/time/cluster."""
        from log_formatter_ray.ops.sample import reservoir_top_hash

        sample = reservoir_top_hash(
            ds.select_columns([id_col, emb_col]), sample_rows, id_col=id_col
        )
        V = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(self.seed)
        C = V[rng.choice(len(V), size=min(self.n_clusters, len(V)), replace=False)]
        for _ in range(self.iters):
            assign = (V @ C.T).argmax(axis=1)
            for c in range(len(C)):
                members = V[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
            C = _normalize(C)
        self.centroids = C
        return self

    def assign(self, ds, emb_col: str = "embedding"):
        cref = ray.put(self.centroids)

        def tag(batch: pa.Table) -> pa.Table:
            C = ray.get(cref)
            V = _normalize(_as_matrix(batch[emb_col], len(batch)).astype(np.float64))
            cl = (V @ C.T).argmax(axis=1)
            return batch.append_column("cluster", pa.array(cl.astype(np.int32)))

        return ds.map_batches(
            tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    def search(
        self,
        assigned_ds,
        queries: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        """Probe the ``nprobe`` nearest clusters per query, brute-force within."""
        queries = np.atleast_2d(queries)
        Q = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(Q @ self.centroids.T), axis=1)[:, :nprobe]
        probe_set = pa.array(np.unique(probe).astype(np.int32))

        filtered = assigned_ds.map_batches(
            lambda b: b.filter(pc.is_in(b["cluster"], value_set=probe_set)),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        return brute_force_topk(filtered, queries, k=k, emb_col=emb_col, id_col=id_col)

    # ----- at-rest partitioned layout: probe by DIRECTORY, not by scan ----

    def write_partitioned(self, ds, path: str, emb_col: str = "embedding") -> str:
        """Persist the corpus hive-partitioned by cluster id
        (``path/cluster=<c>/``) so searches read ONLY the probed
        partitions from storage — at 100 TB the difference between a
        full-corpus scan per query batch and nprobe/n_clusters of it."""
        self.assign(ds, emb_col).write_parquet(path, partition_cols=["cluster"])
        return path

    def probed_dirs(self, path: str, queries: np.ndarray, nprobe: int = 4) -> list[str]:
        """The partition directories a search for ``queries`` would read."""
        import os

        queries = np.atleast_2d(queries)
        Q = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(Q @ self.centroids.T), axis=1)[:, :nprobe]
        dirs = [os.path.join(path, f"cluster={int(c)}") for c in np.unique(probe)]
        return [d for d in dirs if os.path.isdir(d)]

    def search_partitioned(
        self,
        path: str,
        queries: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        emb_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        """Search a ``write_partitioned`` layout: list the nprobe nearest
        clusters' directories, ``read_parquet`` ONLY those, brute-force
        within.  Unprobed partitions are never opened."""
        import glob
        import os

        import ray.data as rd

        dirs = self.probed_dirs(path, queries, nprobe)
        files = sorted(
            f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet"))
        )
        if not files:  # every probed cluster is empty: zero candidates,
            return pd.DataFrame(  # same shape the in-memory path returns
                {
                    "query_idx": pd.Series(dtype="int32"),
                    id_col: pd.Series(dtype="int64"),
                    "cos": pd.Series(dtype="float64"),
                    "rank": pd.Series(dtype="int64"),
                }
            )
        from log_formatter_ray.sources import read_parquet_clean

        ds = read_parquet_clean(files)
        return brute_force_topk(
            ds, np.atleast_2d(queries), k=k, emb_col=emb_col, id_col=id_col
        )
