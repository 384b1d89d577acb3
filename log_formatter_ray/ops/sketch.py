"""Mergeable sketches: HyperLogLog approximate distinct count.

The mergeable-sketch pattern for corpus-wide statistics (SURVEY custom
operators): one small sketch per block inside ``map_batches``, merged on
the driver — no shuffle, constant memory, mathematically mergeable
(Flajolet et al. 2007; the standard public algorithm).

Register width b=12 → 4096 registers, standard error ≈ 1.04/√4096 ≈ 1.6%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from log_formatter_ray.ops.dedup import _stable_hash64

_B = 12
_M = 1 << _B
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def hll_sketch(values) -> np.ndarray:
    """Dense HLL register array (uint8, len 4096) for a list of values."""
    regs = np.zeros(_M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _stable_hash64(values)
    idx = (h & np.uint64(_M - 1)).astype(np.int64)
    rest = h >> np.uint64(_B)
    # rank = position of the leftmost 1-bit in the remaining 52 bits (1-based)
    nbits = 64 - _B
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for r in range(1, nbits + 1):
        bit = (rest >> np.uint64(nbits - r)) & np.uint64(1)
        newly = (~found) & (bit == 1)
        rank[newly] = r
        found |= newly
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:  # small-range correction
        est = _M * np.log(_M / zeros)
    return float(est)


def approx_distinct(
    ds, col: str, reduce_width: int = 8, merge_batch: int = 64
) -> float:
    """Corpus-wide approximate COUNT(DISTINCT col): per-block sketches
    merged through a two-level TREE before the driver (the
    ``token_histogram`` reduce shape — VERDICT r4 item 2: the round-4
    driver loop merged one 4 KB sketch PER BLOCK in interpreted Python,
    ~4 GB through one process at 10⁶ blocks).

    Reduce shape: a first merge level FUSES into the partial stage
    (``batch_size=merge_batch`` max-merges ``merge_batch`` sketches per
    task, no shuffle), one ``repartition(reduce_width)`` moves the
    survivors, a second merge level collapses per partition, and the
    driver max-merges at most ~max(reduce_width, blocks/merge_batch²)
    register matrices — vectorized, never per-row Python."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].combine_chunks().to_numpy(zero_copy_only=False)
        regs = hll_sketch(vals)
        sketch = pa.ListArray.from_arrays(
            pa.array([0, _M], pa.int32()), pa.array(regs, pa.uint8())
        )
        return pa.table({"sketch": sketch})

    def merge(batch: pa.Table) -> pa.Table:
        sk = batch["sketch"].combine_chunks()
        regs = np.asarray(sk.flatten()).reshape(-1, _M).max(axis=0)
        return pa.table(
            {
                "sketch": pa.ListArray.from_arrays(
                    pa.array([0, _M], pa.int32()), pa.array(regs, pa.uint8())
                )
            }
        )

    merged = (
        ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
        .repartition(reduce_width)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
    )
    total = np.zeros(_M, dtype=np.uint8)
    for b in merged.iter_batches(batch_format="pyarrow"):
        sk = b["sketch"].combine_chunks()
        regs = np.asarray(sk.flatten()).reshape(-1, _M)
        total = np.maximum(total, regs.max(axis=0))
    return hll_estimate(total)


def approx_distinct_per_key(ds, key: str, col: str):
    """Per-``key`` approximate COUNT(DISTINCT col) → Dataset (key,
    approx_n:int64).

    Fully distributed sketch merging: each block emits one 4 KB HLL per
    (block × key) — the partial-aggregation pattern with a mergeable
    sketch as the accumulator — and a groupby over the KEY max-merges the
    registers.  Only sketches shuffle (|keys per block| × 4 KB per block),
    never the values; a hot key costs |blocks| sketch rows, not its row
    count."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    key: batch[key].combine_chunks(),
                    "sketch": pa.LargeListArray.from_arrays(
                        pa.array([0], pa.int64()), pa.array([], pa.uint8())
                    ),
                }
            )
        idx = pc.sort_indices(batch[key])
        sorted_keys = batch[key].combine_chunks().take(idx)
        vals = batch[col].combine_chunks().take(idx).to_numpy(zero_copy_only=False)
        karr = sorted_keys.to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(karr[1:] != karr[:-1]) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, len(karr)]
        regs = np.stack(
            [hll_sketch(vals[s:e]) for s, e in zip(starts, ends)]
        ) if len(karr) else np.zeros((0, _M), np.uint8)
        # int64 (large_list) offsets: int32 would silently wrap past ~524k
        # distinct keys per block (524288 × 4096 > 2^31) and corrupt every
        # per-key count downstream — the exact hot-key-proof contract this
        # op exists for
        offsets = np.arange(len(starts) + 1, dtype=np.int64) * _M
        sketches = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(regs.reshape(-1), pa.uint8())
        )
        return pa.table(
            {key: sorted_keys.take(pa.array(starts)), "sketch": sketches}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack(g["sketch"].to_numpy()).astype(np.uint8).max(axis=0)
        return pd.DataFrame(
            {key: [g[key].iloc[0]], "approx_n": [int(round(hll_estimate(regs)))]}
        )

    return partials.groupby(key).map_groups(merge, batch_format="pandas")


def approx_distinct_per_window(
    ds, ts_col: str, col: str, unit: str = "hour", out_key: str = "window"
):
    """Windowed approximate COUNT(DISTINCT col) — e.g. "approx unique users
    per hour" → Dataset (window:timestamp[us], approx_n:int64).

    Composition of the tumbling-window floor (``ops/window.py``) with the
    per-key mergeable-HLL reduce: per (block × window) 4 KB sketches are
    the only thing that shuffles, so a corpus-scale hour still costs
    |blocks| sketch rows, never its event count.  Windows ride the shuffle
    as int64 in the SOURCE unit (Ray's sort groupby pickles nullable
    timestamps) and are recast to that same unit at the end — a hardcoded
    'us' recast would silently mis-scale timestamp[s]/[ns] inputs (ADVICE
    r3); null timestamps form their own null window."""
    import pyarrow.compute as _pc

    ts_type = dict(zip(ds.schema().names, ds.schema().types))[ts_col]
    if not (isinstance(ts_type, pa.DataType) and pa.types.is_timestamp(ts_type)):
        ts_type = pa.timestamp("us")

    def floor_to_int(b: pa.Table) -> pa.Table:
        w = _pc.floor_temporal(b[ts_col].cast(ts_type), unit=unit)
        return pa.table(
            {
                out_key: _pc.cast(w, pa.int64()).combine_chunks(),
                col: b[col].combine_chunks(),
            }
        )

    win = ds.map_batches(
        floor_to_int, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    out = approx_distinct_per_key(win, out_key, col)

    def recast(t: pa.Table) -> pa.Table:
        i = t.column_names.index(out_key)
        return t.set_column(
            i, out_key, _pc.cast(t[out_key], ts_type)
        )

    return out.map_batches(
        recast, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# t-digest: mergeable approximate quantiles (Dunning & Ertl, public
# algorithm).  One small digest per block inside ``map_batches``, tree-
# merged like ``token_histogram`` — ONE pass over the corpus, no shuffle.
# The exact-but-3-pass alternative for continuous values is
# ``stages/aggregate.py::grouped_quantile_binned``; use the digest when a
# single streaming pass matters more than exactness (error concentrates
# at the median, extreme quantiles are tight by the k1 scale function).
# ---------------------------------------------------------------------------

class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function.

    State is two aligned float64 arrays (mean, weight) sorted by mean,
    bounded to ~``delta`` clusters — a few KB, serializable, mergeable in
    any order/grouping.  Compression is fully vectorized: points/clusters
    sort by mean, map to k-space ``k(q) = δ/(2π)·asin(2q−1)``, and fuse
    within integer k-bands (one ``np.add.reduceat`` per compress)."""

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = (
            weights if weights is not None else np.empty(0, np.float64)
        )

    def _compress(self, m: np.ndarray, w: np.ndarray) -> None:
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        if not total:
            self.means = np.empty(0, np.float64)
            self.weights = np.empty(0, np.float64)
            return
        # left-edge quantile of each cluster, mapped to k-space
        q = (np.cumsum(w) - w) / total
        k = (self.delta / (2 * np.pi)) * np.arcsin(
            np.clip(2 * q - 1, -1.0, 1.0)
        )
        band = np.floor(k).astype(np.int64)
        new = np.ones(band.size, dtype=bool)
        new[1:] = band[1:] != band[:-1]
        starts = np.flatnonzero(new)
        ws = np.add.reduceat(w, starts)
        ms = np.add.reduceat(m * w, starts) / ws
        self.means, self.weights = ms, ws

    def add_array(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            self._compress(
                np.r_[self.means, v], np.r_[self.weights, np.ones(v.size)]
            )
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size:
            self._compress(
                np.r_[self.means, other.means],
                np.r_[self.weights, other.weights],
            )
        return self

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Interpolated quantile (NaN on an empty digest)."""
        if not self.means.size:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        w, m = self.weights, self.means
        total = w.sum()
        target = q * total
        # cluster CENTERS in cumulative-weight space
        centers = np.cumsum(w) - w / 2
        if target <= centers[0]:
            return float(m[0])
        if target >= centers[-1]:
            return float(m[-1])
        i = np.searchsorted(centers, target) - 1
        span = centers[i + 1] - centers[i]
        frac = 0.0 if span <= 0 else (target - centers[i]) / span
        return float(m[i] + frac * (m[i + 1] - m[i]))

    # -- serialization over Arrow (list<float64> of [n, means..., weights..]) --
    def to_array(self) -> np.ndarray:
        return np.r_[np.float64(self.means.size), self.means, self.weights]

    @classmethod
    def from_array(cls, arr: np.ndarray, delta: int = 200) -> "TDigest":
        k = int(arr[0])
        return cls(delta, arr[1 : 1 + k].copy(), arr[1 + k : 1 + 2 * k].copy())


def approx_quantiles(
    ds, col: str, qs: list[float], delta: int = 200, merge_batch: int = 64
) -> list[float]:
    """ONE-pass corpus-wide approximate quantiles: per-block t-digests,
    fused first-level merge, driver finishes the (tiny) tail — the
    ``token_histogram`` tree-reduce shape, kilobytes per block."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].combine_chunks().to_numpy(zero_copy_only=False)
        d = TDigest(delta).add_array(vals.astype(np.float64))
        arr = d.to_array()
        return pa.table(
            {
                "digest": pa.ListArray.from_arrays(
                    pa.array([0, arr.size], pa.int32()),
                    pa.array(arr, pa.float64()),
                )
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        acc = TDigest(delta)
        dl = batch["digest"].combine_chunks()
        for i in range(len(batch)):
            acc.merge(TDigest.from_array(
                np.asarray(dl[i].values), delta
            ))
        arr = acc.to_array()
        return pa.table(
            {
                "digest": pa.ListArray.from_arrays(
                    pa.array([0, arr.size], pa.int32()),
                    pa.array(arr, pa.float64()),
                )
            }
        )

    merged = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
    acc = TDigest(delta)
    for b in merged.iter_batches(batch_format="pyarrow"):
        dl = b["digest"].combine_chunks()
        for i in range(len(dl)):
            acc.merge(TDigest.from_array(np.asarray(dl[i].values), delta))
    return [acc.quantile(q) for q in qs]


def approx_quantiles_per_key(
    ds, key: str, col: str, qs: list[float], delta: int = 200
):
    """Per-``key`` one-pass approximate quantiles → Dataset (key, q_<x>
    columns) — the t-digest twin of :func:`approx_distinct_per_key`: each
    block emits one small digest per (block × key), a key-grouped merge
    fuses them, and only digests ever shuffle (a hot key costs |blocks|
    digest rows, never its row count)."""
    import pandas as pd

    qcols = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    key: batch[key].combine_chunks(),
                    "digest": pa.LargeListArray.from_arrays(
                        pa.array([0], pa.int64()), pa.array([], pa.float64())
                    ),
                }
            )
        idx = pc.sort_indices(batch[key])
        sorted_keys = batch[key].combine_chunks().take(idx)
        vals = batch[col].combine_chunks().take(idx).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        karr = sorted_keys.to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(karr[1:] != karr[:-1]) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, len(karr)]
        arrs = [
            TDigest(delta).add_array(vals[s:e]).to_array()
            for s, e in zip(starts, ends)
        ]
        offsets = np.zeros(len(arrs) + 1, np.int64)
        np.cumsum([a.size for a in arrs], out=offsets[1:])
        digests = pa.LargeListArray.from_arrays(
            pa.array(offsets),
            pa.array(np.concatenate(arrs) if arrs else np.empty(0),
                     pa.float64()),
        )
        return pa.table(
            {key: sorted_keys.take(pa.array(starts)), "digest": digests}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = TDigest(delta)
        for arr in g["digest"].to_numpy():
            acc.merge(TDigest.from_array(np.asarray(arr), delta))
        out = {key: [g[key].iloc[0]]}
        for q, c in zip(qs, qcols):
            out[c] = [acc.quantile(q)]
        return pd.DataFrame(out)

    return partials.groupby(key).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: mergeable top-k over UNBOUNDED key cardinality
# (Misra & Gries 1982; mergeable-summary form of Agarwal et al., PODS'12).
# The exact top-k plans (groupby + Sum) shuffle one row per distinct key —
# fine while the vocabulary is bounded; a raw web corpus's tail is not.
# An MG summary of size m guarantees: every item with true frequency
# > n/(m+1) is present, and reported counts are within n/(m+1) of truth.
# ---------------------------------------------------------------------------

def _mg_reduce(values: np.ndarray, counts: np.ndarray, m: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Reduce exact/summary (value, count) pairs to an m-sized MG summary:
    subtract the (m+1)-th largest count from everything, keep positives
    (vectorized — no per-item loop)."""
    if values.size <= m:
        return values, counts
    order = np.argsort(counts, kind="stable")[::-1]
    d = counts[order[m]]
    keep = order[:m]
    kept = counts[keep] - d
    pos = kept > 0
    return values[keep][pos], kept[pos]


def heavy_hitters(
    ds, col: str, k: int = 10, m: int = 4096, merge_batch: int = 64
):
    """Approximate top-``k`` most frequent values of ``col`` with BOUNDED
    memory everywhere: per-block exact counts reduce to an m-sized MG
    summary, summaries tree-merge (concat → sum by value → reduce), and
    the driver finishes the tail — no value-keyed corpus shuffle at all.

    Returns ``(values, lower, upper)``: reported count is a LOWER bound;
    ``upper = lower + err`` where ``err`` accumulates the subtracted mass
    (≤ n/(m+1) total).  Any value with true frequency > n/(m+1) + the
    k-th count is guaranteed to appear in the top-k.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        vals = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        cnts = t["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(cnts.sum())
        v, c = _mg_reduce(vals, cnts, m)
        err = total - int(c.sum())  # mass subtracted by the reduction
        return pa.table(
            {
                col: pa.array(v),
                "_cnt": pa.array(c, pa.int64()),
                # error rides along on the first row of each summary
                "_err": pa.array(
                    np.r_[err, np.zeros(max(len(v) - 1, 0), np.int64)]
                    if len(v) else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        t = batch.group_by([col]).aggregate([("_cnt", "sum"), ("_err", "sum")])
        vals = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        cnts = t["_cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        err = int(t["_err_sum"].to_numpy(zero_copy_only=False).sum())
        total = int(cnts.sum())
        v, c = _mg_reduce(vals, cnts, m)
        err += total - int(c.sum())
        return pa.table(
            {
                col: pa.array(v),
                "_cnt": pa.array(c, pa.int64()),
                "_err": pa.array(
                    np.r_[err, np.zeros(max(len(v) - 1, 0), np.int64)]
                    if len(v) else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    # merge levels consume ``merge_batch`` SUMMARIES (≤ m rows each) per
    # call: one fused level + one post-coalesce level bound any remaining
    # fan-in, and the driver finish re-merges whatever is left (correct
    # for ANY residual summary count — err is tracked explicitly, so the
    # bounds hold under arbitrary merge grouping/slicing)
    rows_per_merge = m * merge_batch
    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .map_batches(merge, batch_format="pyarrow",
                     batch_size=rows_per_merge)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow",
                     batch_size=rows_per_merge)
        .to_pandas()
    )
    err = int(merged["_err"].sum())
    final = (
        merged.groupby(col, as_index=False)["_cnt"].sum()
        .sort_values(["_cnt", col], ascending=[False, True])
        .head(k)
    )
    return (
        final[col].to_numpy(),
        final["_cnt"].to_numpy(np.int64),
        final["_cnt"].to_numpy(np.int64) + err,
    )
