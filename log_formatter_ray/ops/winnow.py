"""Winnowing document fingerprints for duplicated-SPAN detection
(Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the public MOSS algorithm).

Where MinHash asks "are these documents mostly the same?", winnowing asks
"do these documents share any contiguous span of ≥ t words?" — the shape
of boilerplate/quotation/license-block detection and of exact-substring
dedup at corpus scale (cf. Lee et al. 2022's suffix-array span dedup,
whose guarantees winnowing approximates with O(n) local work instead of a
global suffix array).

Guarantee (the paper's): with k-gram hashes and window w, any shared
span of at least ``t = w + k − 1`` words produces at least one SHARED
selected fingerprint, while the selected density is ~2/(w+1) — so the
corpus collapses to a sparse (doc, fingerprint) set before the only
shuffle.

Pipeline shape (all repo-standard patterns):

1. per batch: word hashes → rolling k-gram hashes
   (``ops/dedup._shingle_hashes``) → vectorized sliding-window minima →
   per-row DISTINCT fingerprints (one lexsort, no per-row Python);
2. ONE coarse groupby over ``fingerprint % coarse``: equal-fingerprint
   runs emit candidate doc pairs (capped buckets, logged truncation);
3. a tiny pair-keyed count keeps pairs sharing ≥ ``min_shared``
   fingerprints.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from log_formatter_ray.ops.dedup import (
    _run_bounds,
    _shingle_hashes,
    _split_word_hashes,
)

logger = logging.getLogger("log_formatter_ray")


def winnow_select(h: np.ndarray, offsets: np.ndarray, w: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Per-row winnowing selection over flat k-gram hashes: the minimum of
    every ``w``-window of consecutive gram hashes, deduplicated per row.

    Fully vectorized: one global sliding-window min (rows with fewer than
    ``w`` grams contribute the min of what they have), valid windows
    gathered per row, then one lexsort pass for per-row distinct.
    Returns ``(fingerprints, out_offsets)`` in flat-values/offsets layout.
    """
    n = len(offsets) - 1
    ng = np.diff(offsets)
    counts = np.where(ng >= w, ng - w + 1, (ng > 0).astype(np.int64))
    sel_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=sel_off[1:])
    sel = np.empty(int(sel_off[-1]), np.uint64)
    if not sel.size:
        return sel, sel_off
    long_rows = ng >= w
    if long_rows.any():
        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        mins = sw.min(axis=1)
        reps = np.where(long_rows, counts, 0)
        base = np.repeat(offsets[:-1], reps)
        csum = np.zeros(n, np.int64)
        np.cumsum(reps[:-1], out=csum[1:])
        intra = np.arange(int(reps.sum())) - np.repeat(csum, reps)
        dest = np.repeat(sel_off[:-1], reps) + intra
        sel[dest] = mins[base + intra]
    short = np.flatnonzero((ng > 0) & ~long_rows)
    for r in short:  # rows shorter than one window: min of all their grams
        sel[sel_off[r]] = h[offsets[r] : offsets[r + 1]].min()

    # per-row distinct via one lexsort (consecutive windows usually share
    # their min — selection density is ~2/(w+1) after this)
    gid = np.repeat(np.arange(n), np.diff(sel_off))
    order = np.lexsort((sel, gid))
    gs, fs = gid[order], sel[order]
    keep = np.ones(gs.size, bool)
    keep[1:] = (gs[1:] != gs[:-1]) | (fs[1:] != fs[:-1])
    out = fs[keep]
    per_row = np.bincount(gs[keep], minlength=n)
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(per_row, out=out_off[1:])
    return out, out_off


def add_winnow_fingerprints(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    coarse: int = 256,
) -> pa.Table:
    """(id, fingerprint, part) rows for a batch — the sparse exploded form
    that feeds the one fingerprint-keyed shuffle.  ``k``/``w`` set the
    guarantee threshold t = w + k − 1 words."""
    wh, w_off = _split_word_hashes(batch[text_col])
    grams, g_off = _shingle_hashes(wh, w_off, k)
    fps, f_off = winnow_select(grams, g_off, w)
    ids = batch[id_col].combine_chunks().take(
        pa.array(np.repeat(np.arange(len(batch)), np.diff(f_off)))
    )
    return pa.table(
        {
            id_col: ids,
            "fp": pa.array(fps.astype(np.int64)),
            "part": pa.array((fps % np.uint64(coarse)).astype(np.int32)),
        }
    )


def span_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 200,
    coarse: int = 256,
):
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    i.e. likely sharing contiguous spans of ≥ w+k−1 words → Dataset
    (a, b, n_shared), a < b.

    Scale shape: the corpus collapses to ~2·words/(w+1) fingerprint rows
    before the single coarse shuffle; equal-fingerprint runs pair inside
    partitions (buckets capped at ``max_bucket`` with a logged count — a
    fingerprint shared by everything is boilerplate, not a pair source);
    the final pair count groupby runs over the sparse pair set only.
    """
    def explode(batch: pa.Table) -> pa.Table:
        return add_winnow_fingerprints(
            batch, text_col=text_col, id_col=id_col, k=k, w=w, coarse=coarse
        )

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["fp", id_col], kind="stable")
        keys = g["fp"].to_numpy()
        ids = g[id_col].to_numpy()
        out_a, out_b = [], []
        starts, ends = _run_bounds(keys)
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > max_bucket:
                logger.warning(
                    "winnow fingerprint %d truncated: %d -> %d members",
                    int(keys[s]), int(e - s), max_bucket,
                )
                e = s + max_bucket
            iu, ju = np.triu_indices(e - s, k=1)
            out_a.append(ids[s:e][iu])
            out_b.append(ids[s:e][ju])
        if out_a:
            return pd.DataFrame(
                {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
            )
        return pd.DataFrame({"a": ids[:0], "b": ids[:0]})

    cand = exploded.groupby("part").map_groups(pairs, batch_format="pandas")
    counted = cand.groupby(["a", "b"]).count()

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["count()"], min_shared))
        return t.rename_columns(
            [c if c != "count()" else "n_shared" for c in t.column_names]
        )

    return counted.map_batches(
        finish, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
