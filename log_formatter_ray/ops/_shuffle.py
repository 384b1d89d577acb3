"""Coarse hash partitioning for keyed map_groups stages.

Ray's ``groupby(key).map_groups(fn)`` calls ``fn`` once per DISTINCT KEY —
per-group pandas/Python overhead that dominates wall time when keys are
numerous (measured 14× on exact-dedup at 200k keys).  The repo-wide
pattern instead groups on ``hash(key) % coarse`` and runs a VECTORIZED
function once per coarse partition; all rows of a key still land in one
group, and ``coarse`` bounds partition width independently of key count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PART_COL = "_part"


def _canonical(values: np.ndarray) -> np.ndarray:
    """Stable dtype for hashing: int-kind → int64, everything else →
    object (pandas may have float-upcast int keys; hash_array(float) !=
    hash_array(int))."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return arr.astype(np.int64)
    if arr.dtype != object:
        return arr.astype(object)
    return arr


def hash_part(values: np.ndarray, coarse: int) -> np.ndarray:
    h = pd.util.hash_array(_canonical(values), categorize=False)
    return (h % np.uint64(coarse)).astype(np.int32)


def hash_part_cols(cols: list[np.ndarray], coarse: int, n: int) -> np.ndarray:
    """Multi-column coarse partition: FNV-fold the per-column stable hashes
    — the ONE canonical recipe (used by add_coarse_part and by pandas-side
    callers, so the combine can never drift between copies)."""
    h = np.zeros(n, dtype=np.uint64)
    for vals in cols:
        h = h * np.uint64(1099511628211) ^ pd.util.hash_array(
            _canonical(vals), categorize=False
        )
    return (h % np.uint64(coarse)).astype(np.int32)


def add_coarse_part(ds, key_cols: list[str], coarse: int = 1024,
                    out_col: str = PART_COL):
    """Append ``out_col`` = hash(key columns) % coarse to every batch."""

    def tag(batch: pa.Table) -> pa.Table:
        part = hash_part_cols(
            [
                batch[c].combine_chunks().to_numpy(zero_copy_only=False)
                for c in key_cols
            ],
            coarse,
            len(batch),
        )
        return batch.append_column(out_col, pa.array(part))

    return ds.map_batches(
        tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
