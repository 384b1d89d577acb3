"""Semi / anti joins via broadcast key sets (+ Bloom filter scale path).

The guide's pattern: broadcast the small side's key set (or a Bloom filter
of it) and filter inside ``map_batches`` — no shuffle of the big side.

* ``semi_join`` / ``anti_join`` — EXACT: the full key set is broadcast
  (``ray.put`` once, zero-copy per worker).  Right for key sets up to
  ~10^8 (a few GB of Arrow).
* ``BloomFilter`` — the beyond-RAM path: fixed-size bit array, k hashes;
  false positives only (never false negatives), so a Bloom SEMI join may
  keep extra rows and a Bloom ANTI join may drop extra rows — use it as a
  pre-filter followed by the exact check on the survivors, which is the
  standard two-phase plan at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from log_formatter_ray.ops.dedup import _stable_hash64


def _key_filter(ds, key_col: str, keys: pa.Array, invert: bool):
    if len(keys) == 0:
        # empty pa.array is null-typed → pc.is_in would raise against a
        # typed column; the answers are trivial anyway
        if invert:
            return ds.map_batches(
                lambda b: b.filter(pc.is_valid(b[key_col])),
                batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
            )
        return ds.map_batches(
            lambda b: b.slice(0, 0),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
    keys_ref = ray.put(keys)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key_col], value_set=ray.get(keys_ref))
        if invert:
            # SQL NOT IN drops NULL keys (unknown), but pc.is_in maps null
            # → False, which invert would KEEP — mask nulls out explicitly.
            mask = pc.and_(pc.invert(mask), pc.is_valid(batch[key_col]))
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def semi_join(ds, key_col: str, keys) -> "object":
    """Rows of ``ds`` whose ``key_col`` IS IN ``keys`` (exact broadcast;
    null keys never match, same as SQL IN)."""
    return _key_filter(ds, key_col, pa.array(list(keys)) if not isinstance(keys, pa.Array) else keys, invert=False)


def anti_join(ds, key_col: str, keys) -> "object":
    """Rows of ``ds`` whose ``key_col`` is NOT IN ``keys`` (exact broadcast;
    null keys are dropped, same as SQL NOT IN's unknown semantics)."""
    return _key_filter(ds, key_col, pa.array(list(keys)) if not isinstance(keys, pa.Array) else keys, invert=True)


class BloomFilter:
    """Simple double-hashing Bloom filter over 64-bit stable hashes.

    ``m`` bits, ``k`` probes; FP rate ≈ (1 - e^{-kn/m})^k.  Serializable
    (one numpy array) → broadcastable with ``ray.put``.
    """

    def __init__(self, num_items: int, fp_rate: float = 0.01):
        m = int(-num_items * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        self.m = max(m, 64)
        self.k = max(1, int(round(self.m / max(num_items, 1) * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        h = _stable_hash64(list(values))
        h1 = h % np.uint64(self.m)
        h2 = (h >> np.uint64(32) | np.uint64(1)) % np.uint64(self.m)
        # double hashing: pos_i = (h1 + i*h2) mod m   (Kirsch–Mitzenmacher)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add(self, values) -> "BloomFilter":
        pos = self._positions(values).reshape(-1)
        np.bitwise_or.at(self.bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))
        return self

    def contains(self, values) -> np.ndarray:
        pos = self._positions(values)  # (k, n)
        word = self.bits[pos // 64]
        bit = (word >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return bit.all(axis=0).astype(bool)


def bloom_semi_join(ds, key_col: str, bloom: BloomFilter):
    """Bloom pre-filter semi join: keeps all true matches plus ~fp_rate
    false positives; chain an exact ``semi_join`` on the survivors for an
    exact result at scale."""
    bloom_ref = ray.put(bloom)

    def fn(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        mask = bf.contains(batch[key_col].to_pylist())
        return batch.filter(pa.array(mask))

    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# Range (interval) join — a custom operator Ray Data does not ship.
# ---------------------------------------------------------------------------

def range_count_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    lo_s: float,
    hi_s: float,
    count_alias: str = "n_in_range",
    coarse: int = 256,
):
    """For every left row, COUNT right rows with the same ``by`` key and
    ``on`` in the half-open window (left.on + lo_s, left.on + hi_s] —
    e.g. "events by the same user within 5 minutes after each error".

    Composition: pad both sides to a common schema, tag, union, shuffle
    ONCE by a COARSE hash of the join key, then count via two vectorized
    ``pd.merge_asof(by=key)`` rank lookups per partition — rank(bound) =
    per-key running index of the last right row ≤ bound, so count =
    rank(hi) − rank(lo).  Every key of a partition is served by those two
    C-level calls: no per-key Python, no pairwise expansion (a hot key
    costs n log n, not n²).

    Partitioning assumption (stated per the build contract): one partition
    = its keys' rows from both sides, which must fit in a worker — true
    for per-user/per-entity event streams; salt into (key,
    coarse-time-bucket) with ±hi_s boundary overlap if a single key's
    history exceeds memory.
    """
    from log_formatter_ray.ops._shuffle import PART_COL, hash_part

    lschema = left_ds.schema()
    left_cols = list(lschema.names)
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    rschema = right_ds.schema()
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}

    def pad(side: str, keep: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            out = {}
            for c in left_cols:
                if c in batch.column_names and c in keep:
                    out[c] = batch[c].combine_chunks()
                else:
                    out[c] = pa.nulls(n, ltypes.get(c) or rtypes.get(c))
            out["_side"] = pa.array([side] * n)
            out[PART_COL] = pa.array(
                hash_part(
                    batch[by].combine_chunks().to_numpy(zero_copy_only=False),
                    coarse,
                )
            )
            return pa.table(out)

        return fn

    unioned = left_ds.map_batches(
        pad("L", left_cols), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).union(
        right_ds.map_batches(
            pad("R", [by, on]), batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    )
    return _range_reduce(
        unioned, left_cols, ltypes, by, on, lo_s, hi_s, count_alias
    )


def range_count_join_self(
    ds,
    by: str,
    on: str,
    lo_s: float,
    hi_s: float,
    left_filter,
    left_cols: list[str],
    count_alias: str = "n_in_range",
    coarse: int = 256,
):
    """``range_count_join`` where BOTH sides come from the SAME dataset:
    for every row matching ``left_filter`` (a ``pa.Table → boolean mask``
    callable), count ALL dataset rows with the same ``by`` key and ``on``
    in (left.on + lo_s, left.on + hi_s].

    One streaming pass: each batch emits its tagged left rows AND its
    (by, on) right rows from the same read — no ``materialize()`` of the
    input, no second scan, no two-branch union.  Same partitioning
    assumption (and salting escape hatch) as ``range_count_join``."""
    from log_formatter_ray.ops._shuffle import PART_COL, hash_part

    schema = ds.schema()
    all_types = {n: t for n, t in zip(schema.names, schema.types)}
    ltypes = {c: all_types[c] for c in left_cols}

    def pad_both(batch: pa.Table) -> pa.Table:
        lrows = batch.filter(left_filter(batch))
        nl, nr = len(lrows), len(batch)
        out = {}
        for c in left_cols:
            lcol = lrows[c].combine_chunks()
            rcol = (
                batch[c].combine_chunks()
                if c in (by, on)
                else pa.nulls(nr, ltypes[c])
            )
            out[c] = pa.concat_arrays([lcol, rcol])
        out["_side"] = pa.array(["L"] * nl + ["R"] * nr)
        out[PART_COL] = pa.array(
            hash_part(out[by].to_numpy(zero_copy_only=False), coarse)
        )
        return pa.table(out)

    unioned = ds.map_batches(
        pad_both, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return _range_reduce(
        unioned, list(left_cols), ltypes, by, on, lo_s, hi_s, count_alias
    )


def _range_reduce(unioned, left_cols, ltypes, by, on, lo_s, hi_s, count_alias):
    """The shared reduce: one coarse shuffle by the join key, then two
    vectorized ``merge_asof`` rank lookups per partition (count = rank(hi)
    − rank(lo); n log n per hot key, no pairwise expansion)."""
    import pandas as pd

    from log_formatter_ray.ops._shuffle import PART_COL

    left_int_cols = [c for c in left_cols if pa.types.is_integer(ltypes[c])]

    def per_part(group: "pd.DataFrame") -> "pd.DataFrame":
        left = group.loc[group["_side"] == "L", left_cols]
        right = group.loc[group["_side"] == "R", [by, on]].dropna()
        out = left.copy()
        counts = np.zeros(len(left), dtype=np.int64)
        valid = (left[on].notna() & left[by].notna()).to_numpy()
        if len(right) and valid.any():
            right = right.sort_values([by, on], kind="stable")
            right["_ridx"] = right.groupby(by, sort=False).cumcount()
            right = right.sort_values(on, kind="stable")
            lv = left.loc[valid, [by, on]].copy()
            ts_dtype = right[on].dtype  # keep the merge keys' unit identical
            lv["_lo"] = (lv[on] + pd.Timedelta(seconds=lo_s)).astype(ts_dtype)
            lv["_hi"] = (lv[on] + pd.Timedelta(seconds=hi_s)).astype(ts_dtype)
            lv["_row"] = np.arange(len(lv))
            ranks = {}
            for bound in ("_lo", "_hi"):
                m = pd.merge_asof(
                    lv.sort_values(bound, kind="stable")[[by, bound, "_row"]],
                    right[[by, on, "_ridx"]],
                    left_on=bound,
                    right_on=on,
                    by=by,
                    direction="backward",
                )
                ranks[bound] = (
                    m.sort_values("_row")["_ridx"].fillna(-1).to_numpy(np.int64)
                )
            counts[valid] = ranks["_hi"] - ranks["_lo"]
        out[count_alias] = counts
        for c in left_int_cols:
            if not out[c].isna().any():
                out[c] = out[c].astype("int64")
        return out

    return unioned.groupby(PART_COL).map_groups(per_part, batch_format="pandas")
