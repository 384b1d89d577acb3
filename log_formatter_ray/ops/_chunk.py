"""Row-aligned cache-residency chunking for flat-buffer kernels.

The round-5 kernel lesson (MinHash, span corruption — see BASELINE.md):
a kernel that makes K vectorized passes over a whole block's flat value
buffer streams its working set from DRAM K times; running the SAME
passes per row-aligned chunk sized to the cache turns that into ~one
DRAM pass.  Outputs stay byte-identical whenever the kernel is
row-independent (every kernel here is — pinned by slice-invariance
tests).
"""

from __future__ import annotations

import numpy as np

# Default flat-elements-per-chunk: 3–6 working arrays × 8 B × 64k ≈ a few
# MB — inside L2+L3 slice even at 32-way concurrency.
DEFAULT_CHUNK = 1 << 16


def row_chunks(offsets: np.ndarray, target: int = DEFAULT_CHUNK) -> np.ndarray:
    """Row indices cutting ``offsets`` (len n_rows+1, any base) into
    row-aligned chunks of ≈ ``target`` flat elements.  Oversize single
    rows form their own chunk (duplicates collapse via unique)."""
    n = len(offsets) - 1
    vol = offsets - offsets[0]
    marks = np.arange(target, int(vol[-1]), target)
    return np.unique(np.concatenate(
        ([0], np.searchsorted(vol, marks, side="left"), [n])
    )).astype(np.int64)
