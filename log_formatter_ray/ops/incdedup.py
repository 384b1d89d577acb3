"""Incremental exact dedup against a persisted corpus index.

The production shape of dedup under continuous ingest (the flagship's
``poll_ingest`` waves): new arrivals must drop rows already present in
the 100-TB historical corpus WITHOUT re-reading that corpus per wave.

The index is a hash-partitioned parquet layout of 128-bit content
identities — ``<path>/part=<p>/`` holding sorted ``(h1, h2)`` columns,
~16 B per historical row, no text, no ids.  Probing co-partitions the
new rows on the same ``hash % parts`` key and each probe task reads
ONLY its partition directory (pruned at rest, the
``IVFIndex.search_partitioned`` pattern): a wave of any size touches
each index partition at most once, and the historical corpus is never
re-read or shuffled.

``update_dedup_index`` appends the surviving rows' identities as new
sorted row-groups per partition (probes merge across files), so the
wave loop is: ``poll → dedup_against_index → update → write``.
Identity is the same double-siphash family as ``exact_dedup`` light
mode (collision odds ~2⁻¹²⁸).  No counterpart exists in the reference
engine (see COVERAGE.md "Training-data operators").
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from log_formatter_ray.ops._shuffle import PART_COL

_H2_KEY = "lfr-index-hash!!"  # 16 bytes: independent second siphash key


def _identities(batch: pa.Table, text_col: str) -> tuple[np.ndarray, np.ndarray]:
    from log_formatter_ray.ops.dedup import _stable_hash64

    vals = batch[text_col].combine_chunks().to_numpy(zero_copy_only=False)
    h1 = _stable_hash64(vals)
    h2 = pd.util.hash_array(
        np.asarray(vals, dtype=object), categorize=False, hash_key=_H2_KEY
    ).astype(np.uint64)
    return h1, h2


def _tag_part(ds, text_col: str, parts: int):
    def tag(batch: pa.Table) -> pa.Table:
        h1, h2 = _identities(batch, text_col)
        batch = batch.append_column("_h1", pa.array(h1.astype(np.int64)))
        batch = batch.append_column("_h2", pa.array(h2.astype(np.int64)))
        return batch.append_column(
            PART_COL, pa.array((h1 % np.uint64(parts)).astype(np.int32))
        )

    return ds.map_batches(
        tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def _part_file(path: str, p: int) -> str:
    return os.path.join(path, f"part={p}")


def _read_part(path: str, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-merged (h1, h2) of one index partition (all row-groups)."""
    d = _part_file(path, p)
    if not os.path.isdir(d):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pq.read_table(d, columns=["h1", "h2"])
    h1 = t["h1"].to_numpy()
    h2 = t["h2"].to_numpy()
    order = np.lexsort((h2, h1))
    return h1[order], h2[order]


def _probe(h1: np.ndarray, h2: np.ndarray, i1: np.ndarray,
           i2: np.ndarray) -> np.ndarray:
    """Membership of (h1,h2) rows in the sorted index arrays."""
    if not i1.size or not h1.size:
        return np.zeros(h1.size, bool)
    # probe h1 runs, verify h2 inside: the run is almost always length 1
    # (a longer run means distinct contents collided on h1), so the
    # vectorized single-entry path covers everything but true collisions
    lo = np.searchsorted(i1, h1, side="left")
    hi = np.searchsorted(i1, h1, side="right")
    hit = np.zeros(h1.size, bool)
    runs = hi - lo
    one = runs == 1
    if one.any():
        hit[one] = i2[lo[one]] == h2[one]
    for j in np.flatnonzero(runs > 1):
        hit[j] = bool(np.any(i2[lo[j]:hi[j]] == h2[j]))
    return hit


def build_dedup_index(ds, path: str, text_col: str = "text",
                      parts: int = 256) -> str:
    """Create the index from an existing corpus: one map pass + one
    keyed write; each partition file holds sorted (h1, h2)."""

    def emit(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("_h1", "ascending"), ("_h2", "ascending")]
        )
        g = group.take(order)
        return pa.table({
            "h1": g["_h1"].combine_chunks(),
            "h2": g["_h2"].combine_chunks(),
            "part": g[PART_COL].combine_chunks(),
        })

    (
        _tag_part(ds.select_columns([text_col]), text_col, parts)
        .groupby(PART_COL)
        .map_groups(emit, batch_format="pyarrow")
        .write_parquet(path, partition_cols=["part"])
    )
    return path


def dedup_against_index(ds, path: str, text_col: str = "text",
                        parts: int = 256, within: bool = True,
                        id_col: str | None = None):
    """Drop rows whose content identity is already in the index at
    ``path``; with ``within=True`` (default) also dedup the NEW rows
    against each other — keeper is the min ``id_col`` row when given
    (the ``exact_dedup`` convention), else the first in ``(h1, h2)``
    sort order.  Each probe task reads only its partition directory."""

    def probe_part(group: pa.Table) -> pa.Table:
        p = int(group[PART_COL][0].as_py())
        i1, i2 = _read_part(path, p)
        h1 = group["_h1"].to_numpy(zero_copy_only=False)
        h2 = group["_h2"].to_numpy(zero_copy_only=False)
        drop = _probe(h1, h2, i1, i2)
        if within:
            if id_col is not None:
                ids = group[id_col].combine_chunks().to_numpy(
                    zero_copy_only=False)
                order = np.lexsort((ids, h2, h1))
            else:
                order = np.lexsort((h2, h1))
            s1, s2 = h1[order], h2[order]
            dup = np.zeros(len(order), bool)
            dup[1:] = (s1[1:] == s1[:-1]) & (s2[1:] == s2[:-1])
            first_dup = np.zeros(len(order), bool)
            first_dup[order] = dup
            drop |= first_dup
        return group.filter(pa.array(~drop))

    probed = _tag_part(ds, text_col, parts).groupby(PART_COL).map_groups(
        probe_part, batch_format="pyarrow"
    )
    return probed.drop_columns(["_h1", "_h2", PART_COL])


def update_dedup_index(survivors, path: str, text_col: str = "text",
                       parts: int = 256) -> str:
    """Append the surviving rows' identities as new sorted row-groups
    under each partition (merge-on-probe keeps reads correct without
    rewriting history)."""

    def emit(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("_h1", "ascending"), ("_h2", "ascending")]
        )
        g = group.take(order)
        return pa.table({
            "h1": g["_h1"].combine_chunks(),
            "h2": g["_h2"].combine_chunks(),
            "part": g[PART_COL].combine_chunks(),
        })

    (
        _tag_part(survivors.select_columns([text_col]), text_col, parts)
        .groupby(PART_COL)
        .map_groups(emit, batch_format="pyarrow")
        .write_parquet(path, partition_cols=["part"])
    )
    return path
