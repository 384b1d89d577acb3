"""Corpus-wide exact duplicate-LINE removal (global line dedup).

The RefinedWeb §3.2.3 / Dolma "exact paragraph dedup" curation op: split
every document into lines, keep only the GLOBALLY FIRST occurrence of
each distinct line (winner = smallest ``(id, pos)``), and rewrite each
document with its surviving lines re-joined in order.  Documents whose
every line was removed are dropped.

No counterpart exists in the reference engine (a log formatter — see
COVERAGE.md "Training-data operators"); this is part of the
training-data layer, built Ray-Data-first:

- Pass A ships ONLY ``(h1, h2, id, pos)`` rows — ~28 B per line plus the
  id; the document text never enters the shuffle.  Line identity is a
  128-bit double siphash (two independent keys), the same
  collision-safety budget as ``exact_dedup(mode="light")``.
- Winner election is one coarse keyed ``map_groups`` (hash(h1) %
  ``coarse`` — every copy of a line lands in one partition by
  construction), vectorized sort + run-boundary scan per partition.
- The removal set (``(id, pos)`` pairs of every non-winner copy) comes
  back as a driver broadcast below ``broadcast_limit`` rows, else the
  documents co-partition with the removal pairs on hash(id) — one union
  shuffle, the ``elect_cluster_reps`` attach pattern — so a
  boilerplate-heavy corpus can never exhaust the driver.
- Text rebuild is vectorized end-to-end: one ``split_pattern`` per
  batch, boolean mask, ``binary_join`` — no per-row Python.

``sep`` sets the granularity: ``"\\n"`` for production line/paragraph
dedup, ``" "`` for word granularity (the synthetic test corpus is
single-line; same parameterization precedent as
``textstats.dup_line_stats``).  Null texts are treated as ``""``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from log_formatter_ray.ops._shuffle import PART_COL, hash_part
from log_formatter_ray.ops.dedup import _stable_hash64

_H2_KEY = "lfr-line-dedup!!"  # 16 bytes: independent second siphash key


def _split_lines(text_col, sep: str):
    """``(flat_lines, offsets)`` for a string column split on literal
    ``sep`` — empties kept (DuckDB ``string_split`` semantics), nulls
    treated as ``""``; ``flatten()`` keeps sliced arrays correct."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(text_col, ""), sep)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return lines.flatten(), off - off[0]


def _strip_losers(batch: pa.Table, ldf: pd.DataFrame, text_col: str,
                  id_col: str, sep: str, drop_empty: bool) -> pa.Table:
    """Rewrite ``batch`` docs with their loser lines removed.  ``ldf`` is
    the removal-pair frame ``[id_col, "_pos"]`` (unique pairs)."""
    from log_formatter_ray.ops.textstats import _per_row_sum

    flat, off = _split_lines(batch[text_col], sep)
    counts = np.diff(off)
    n = len(batch)
    ids = batch[id_col].combine_chunks()
    ids_np = ids.to_numpy(zero_copy_only=False)

    keep = np.ones(int(off[-1]), dtype=bool)
    if len(ldf) and len(batch):
        idx = np.repeat(np.arange(n), counts)
        pos = (np.arange(off[-1]) - np.repeat(off[:-1], counts)).astype(
            np.int64
        )
        bdf = pd.DataFrame({id_col: ids_np[idx], "_pos": pos,
                            "_ord": np.arange(len(pos))})
        merged = bdf.merge(
            ldf.assign(_kill=True), on=[id_col, "_pos"], how="left"
        ).sort_values("_ord")
        keep = merged["_kill"].isna().to_numpy()

    kept_counts = _per_row_sum(keep.astype(np.int64), off)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_off[1:])
    kept_lists = pa.LargeListArray.from_arrays(
        pa.array(new_off, pa.int64()), flat.filter(pa.array(keep))
    )
    out = pa.table({
        id_col: ids,
        text_col: pc.binary_join(kept_lists, sep),
        "n_removed": pa.array(counts - kept_counts),
    })
    if drop_empty:
        out = out.filter(pa.array(kept_counts > 0))
    return out


def global_line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    coarse: int = 256,
    broadcast_limit: int = 5_000_000,
    drop_empty: bool = True,
):
    """Remove every non-first occurrence of each distinct line across the
    WHOLE corpus (winner = lexicographically smallest ``(id, pos)``).

    Returns a Dataset ``(id_col, text_col, n_removed)`` — the cleaned
    text plus how many lines were stripped per doc; docs left with zero
    lines are dropped (``drop_empty=False`` keeps them with empty text).
    Equivalent SQL: rank every exploded ``(line, id, pos)`` with
    ``row_number() OVER (PARTITION BY line ORDER BY id, pos)`` and keep
    rank-1 rows.  See the module docstring for the at-scale plan.
    """

    def line_keys(batch: pa.Table) -> pa.Table:
        flat, off = _split_lines(batch[text_col], sep)
        counts = np.diff(off)
        idx = np.repeat(np.arange(len(batch)), counts)
        pos = (np.arange(off[-1]) - np.repeat(off[:-1], counts)).astype(
            np.int64
        )
        vals = flat.to_numpy(zero_copy_only=False)
        h1 = _stable_hash64(vals)
        h2 = pd.util.hash_array(
            np.asarray(vals, dtype=object), categorize=False,
            hash_key=_H2_KEY,
        ).astype(np.uint64)
        return pa.table({
            id_col: batch[id_col].combine_chunks().take(pa.array(idx)),
            "_pos": pa.array(pos),
            "_h1": pa.array(h1.astype(np.int64)),
            "_h2": pa.array(h2.astype(np.int64)),
            PART_COL: pa.array((h1 % np.uint64(coarse)).astype(np.int32)),
        })

    def loser_rows(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("_h1", "ascending"), ("_h2", "ascending"),
                       (id_col, "ascending"), ("_pos", "ascending")],
        )
        g = group.take(order)
        a = g["_h1"].to_numpy(zero_copy_only=False)
        b = g["_h2"].to_numpy(zero_copy_only=False)
        dup = np.zeros(len(g), dtype=bool)
        dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
        return g.filter(pa.array(dup)).select([id_col, "_pos"])

    losers = (
        ds.map_batches(line_keys, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .groupby(PART_COL)
        .map_groups(loser_rows, batch_format="pyarrow")
        .materialize()
    )
    n_losers = losers.count()

    if n_losers <= broadcast_limit:
        ldf = losers.to_pandas() if n_losers else pd.DataFrame(
            {id_col: [], "_pos": []}
        )
        ldf_ref = ray.put(ldf)
        return ds.map_batches(
            lambda b: _strip_losers(b, ray.get(ldf_ref), text_col, id_col,
                                    sep, drop_empty),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    # co-partition docs + removal pairs on hash(id): one union shuffle,
    # removal applied per partition — the driver never holds the pairs
    id_type = None
    for name, typ in zip(ds.schema().names, ds.schema().types):
        if name == id_col:
            id_type = typ

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        return pa.table({
            id_col: ids,
            text_col: batch[text_col].combine_chunks(),
            "_pos": pa.nulls(len(batch), pa.int64()),
            "_slot": pa.array(np.zeros(len(batch), np.int8)),
            PART_COL: pa.array(
                hash_part(ids.to_numpy(zero_copy_only=False), coarse)
            ),
        })

    def tag_losers(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().cast(id_type)
        return pa.table({
            id_col: ids,
            text_col: pa.nulls(len(batch), pa.string()),
            "_pos": batch["_pos"].combine_chunks(),
            "_slot": pa.array(np.ones(len(batch), np.int8)),
            PART_COL: pa.array(
                hash_part(ids.to_numpy(zero_copy_only=False), coarse)
            ),
        })

    unioned = ds.map_batches(
        tag_docs, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).union(losers.map_batches(
        tag_losers, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ))

    def apply_part(group: pa.Table) -> pa.Table:
        slot = group["_slot"]
        docs = group.filter(pc.equal(slot, 0)).select([id_col, text_col])
        pairs = group.filter(pc.equal(slot, 1))
        ldf = pd.DataFrame({
            id_col: pairs[id_col].combine_chunks().to_numpy(
                zero_copy_only=False),
            "_pos": pairs["_pos"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64),
        })
        return _strip_losers(docs, ldf, text_col, id_col, sep, drop_empty)

    return unioned.groupby(PART_COL).map_groups(
        apply_part, batch_format="pyarrow"
    )


def dedup_lines_within(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", sep: str = "\n",
                       drop_empty: bool = False) -> pa.Table:
    """WITHIN-document duplicate-line removal — each document keeps only
    the first occurrence of each of its own lines (the in-doc half of
    the dedup pair; :func:`global_line_dedup` is the corpus-wide one).  Pure per-batch map: one split, one lexsort over
    (row, h1, h2), positions of non-first copies masked, text rebuilt
    with ``binary_join`` — NO shuffle, no state.  Same 128-bit line
    identity as the global op.

    Output: (id_col, text_col, n_removed).  ``drop_empty=False`` default
    (a doc always keeps ≥ 1 line of itself unless it had none)."""
    from log_formatter_ray.ops.dedup import _stable_hash64
    from log_formatter_ray.ops.textstats import _per_row_sum

    flat, off = _split_lines(batch[text_col], sep)
    n = len(batch)
    counts = np.diff(off)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    vals = flat.to_numpy(zero_copy_only=False)
    h1 = _stable_hash64(vals)
    h2 = pd.util.hash_array(
        np.asarray(vals, dtype=object), categorize=False, hash_key=_H2_KEY
    ).astype(np.uint64)

    pos = np.arange(int(off[-1]), dtype=np.int64)
    order = np.lexsort((pos, h2, h1, row))
    r, a, b = row[order], h1[order], h2[order]
    dup_sorted = np.zeros(len(order), dtype=bool)
    dup_sorted[1:] = (r[1:] == r[:-1]) & (a[1:] == a[:-1]) & (b[1:] == b[:-1])
    keep = np.ones(int(off[-1]), dtype=bool)
    keep[order] = ~dup_sorted

    kept_counts = _per_row_sum(keep.astype(np.int64), off)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_off[1:])
    kept_lists = pa.LargeListArray.from_arrays(
        pa.array(new_off, pa.int64()), flat.filter(pa.array(keep))
    )
    out = pa.table({
        id_col: batch[id_col].combine_chunks(),
        text_col: pc.binary_join(kept_lists, sep),
        "n_removed": pa.array(counts - kept_counts),
    })
    if drop_empty:
        out = out.filter(pa.array(kept_counts > 0))
    return out
