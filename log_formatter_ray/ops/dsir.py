"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Select pretraining documents that look like a small TARGET domain:
featurize every document as hashed word uni+bigram counts in ``buckets``
bins, fit two smoothed bag-of-ngrams models (target vs raw corpus), and
score each document with its log importance weight

    log w(x) = Σ_grams  log p_target(bucket) − log p_raw(bucket).

High-weight documents are target-like; select by top-k (or sampled
resampling downstream).  No counterpart exists in the reference engine
(see COVERAGE.md "Training-data operators").  Ray-Data-first plan:

- the two bucket histograms are INTEGER partial bincounts per block,
  merged through the ``token_histogram`` two-level tree (fused first
  level, one ``repartition``, second level) — never a per-block driver
  loop, and integer totals make the fit bit-deterministic regardless of
  block layout;
- the fitted log-ratio vector (``buckets`` float64, ~64 KB) is
  broadcast once with ``ray.put``;
- scoring is one vectorized pass per batch: hash words once, bucket
  uni+bigrams, gather log-ratios, ``reduceat`` per row (bigrams that
  would cross a row boundary are zeroed in place) — per-doc scores are
  independent of batch slicing, so results are parallelism-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from log_formatter_ray.ops.dedup import _FNV_PRIME, _split_word_hashes


def _per_row_fsum(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Float64 per-row segment sums (textstats ``_per_row_sum`` is the
    int64 counts variant; scores must not truncate)."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    nonempty = offsets[:-1] < offsets[1:]
    if vals.size and nonempty.any():
        out[nonempty] = np.add.reduceat(vals, offsets[:-1][nonempty])
    return out


def _gram_buckets(text_col, buckets: int):
    """Hashed uni+bigram bucket ids for a string column.

    Returns ``(uni, w_off, big, big_valid)``: ``uni`` are the per-word
    buckets delimited by ``w_off``; ``big`` are buckets of CONSECUTIVE
    word pairs in the flat word stream (length ``max(len(uni)-1, 0)``)
    with ``big_valid`` False where the pair crosses a row boundary."""
    wh, w_off = _split_word_hashes(text_col)
    B = np.uint64(buckets)
    uni = (wh % B).astype(np.int64)
    if wh.size > 1:
        big = (((wh[:-1] * _FNV_PRIME) ^ wh[1:]) % B).astype(np.int64)
        valid = np.ones(big.size, dtype=bool)
        cross = w_off[1:-1] - 1  # pair (j, j+1) straddling a row start
        cross = cross[(cross >= 0) & (cross < big.size)]
        valid[cross] = False
    else:
        big = np.empty(0, np.int64)
        valid = np.empty(0, bool)
    return uni, w_off, big, valid


def hashed_ngram_histogram(
    ds,
    text_col: str = "text",
    buckets: int = 8192,
    reduce_width: int = 8,
    merge_batch: int = 64,
) -> np.ndarray:
    """Corpus-wide hashed uni+bigram bucket counts (int64, exact) —
    the ``token_histogram`` tree-reduce shape over text grams."""

    def partial(batch: pa.Table) -> pa.Table:
        uni, _, big, valid = _gram_buckets(batch[text_col], buckets)
        h = np.bincount(uni, minlength=buckets)
        if big.size:
            h = h + np.bincount(big[valid], minlength=buckets)
        return pa.table({
            "hist": pa.ListArray.from_arrays(
                pa.array([0, buckets], pa.int32()),
                pa.array(h.astype(np.int64)),
            )
        })

    def merge(batch: pa.Table) -> pa.Table:
        flat = np.asarray(batch["hist"].combine_chunks().flatten())
        s = flat.reshape(-1, buckets).sum(axis=0)
        return pa.table({
            "hist": pa.ListArray.from_arrays(
                pa.array([0, buckets], pa.int32()), pa.array(s)
            )
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
        .repartition(reduce_width)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
    )
    total = np.zeros(buckets, dtype=np.int64)
    for b in merged.iter_batches(batch_format="pyarrow"):
        flat = np.asarray(b["hist"].combine_chunks().flatten())
        total += flat.reshape(-1, buckets).sum(axis=0)
    return total


def fit_dsir(
    target_ds,
    raw_ds,
    text_col: str = "text",
    buckets: int = 8192,
    smoothing: float = 1.0,
) -> np.ndarray:
    """Fit the DSIR log-ratio vector ``log p_target − log p_raw`` from
    two corpora (Laplace-smoothed bag of hashed uni+bigrams).  The
    histograms are exact integers, so the fit is bit-deterministic."""
    ct = hashed_ngram_histogram(target_ds, text_col, buckets)
    cr = hashed_ngram_histogram(raw_ds, text_col, buckets)
    lt = np.log(ct + smoothing) - np.log(ct.sum() + smoothing * buckets)
    lr = np.log(cr + smoothing) - np.log(cr.sum() + smoothing * buckets)
    return lt - lr


def score_dsir(
    ds,
    logratio: np.ndarray,
    text_col: str = "text",
    out_col: str = "dsir_logw",
):
    """Append each document's log importance weight.  One vectorized
    pass; the log-ratio vector is broadcast once."""
    buckets = len(logratio)
    ref = ray.put(np.ascontiguousarray(logratio, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        uni, w_off, big, valid = _gram_buckets(batch[text_col], buckets)
        s = _per_row_fsum(lr[uni], w_off)
        if big.size:
            vals = lr[big]
            vals[~valid] = 0.0
            # bigram j lives in the row whose WORD slice contains words
            # (j, j+1); clipping the word offsets to the bigram count
            # maps row slices into bigram index space (crossing pairs
            # are zeroed above, so they contribute nothing)
            s = s + _per_row_fsum(vals, np.minimum(w_off, big.size))
        return batch.append_column(out_col, pa.array(s, pa.float64()))

    return ds.map_batches(
        score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
