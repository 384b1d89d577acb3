"""As-of join — a custom operator Ray Data does not ship.

Composition (the documented escape hatch): pad both sides to a common
schema, tag, union, shuffle ONCE by a coarse hash of the join key, and run
ONE vectorized ``pd.merge_asof(by=key)`` per partition — every key of the
partition is matched in that single C-level call (grouping by the raw key
would cost one pandas call per key).

Partitioning assumption (stated per the build contract): one partition =
its keys' full history on both sides, which must fit in a worker — true
for per-user/per-entity event streams (``coarse`` spreads keys uniformly);
salt by coarse time range into (key, epoch-bucket) with boundary overlap
if a single key's history exceeds worker memory.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    right_value_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
    coarse: int = 256,
):
    """For every left row, attach the nearest right row (same ``by`` key;
    ``right.on <= left.on`` for direction="backward") — e.g. "the most
    recent sensor reading before each event".

    Output: all left columns + ``on+suffix`` (the matched right timestamp)
    + ``right_value_cols`` (suffixed on name collision); null where no
    right row qualifies.
    """
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    left_cols = list(lschema.names)
    right_keep = [by, on, *right_value_cols]
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}

    # common union schema: left columns + right-only kept columns
    right_only = [c for c in right_keep if c not in left_cols]
    all_cols = left_cols + right_only

    def pad(side: str, keep: list[str], types_other: dict):
        def fn(batch: pa.Table) -> pa.Table:
            from log_formatter_ray.ops._shuffle import hash_part

            n = len(batch)
            out = {}
            for c in all_cols:
                if c in batch.column_names and c in keep:
                    out[c] = batch[c].combine_chunks()
                else:
                    t = ltypes.get(c) or types_other.get(c) or pa.string()
                    out[c] = pa.nulls(n, t)
            out["_side"] = pa.array([side] * n)
            out["_part"] = pa.array(
                hash_part(
                    batch[by].combine_chunks().to_numpy(zero_copy_only=False),
                    coarse,
                )
            )
            return pa.table(out)

        return fn

    unioned = left_ds.map_batches(
        pad("L", left_cols, rtypes), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).union(
        right_ds.map_batches(
            pad("R", right_keep, rtypes), batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    )
    return _asof_reduce(
        unioned, left_cols, ltypes, right_keep, right_value_cols,
        by, on, suffix, direction,
    )


def asof_join_self(
    ds,
    by: str,
    on: str,
    right_value_cols: list[str],
    left_filter,
    left_cols: list[str],
    right_filter=None,
    suffix: str = "_right",
    direction: str = "backward",
    coarse: int = 256,
):
    """``asof_join`` where BOTH sides come from the SAME dataset (e.g.
    "for each purchase, the latest prior click by the same user"): one
    streaming pass tags each batch's left rows (``left_filter``) and right
    rows (``right_filter``, default all rows) — no ``materialize()`` of
    the input, no two-branch double scan.  Filters are ``pa.Table →
    boolean mask`` callables; same partitioning assumption and salting
    escape hatch as ``asof_join``."""
    from log_formatter_ray.ops._shuffle import hash_part

    schema = ds.schema()
    types = {n: t for n, t in zip(schema.names, schema.types)}
    right_keep = [by, on, *right_value_cols]
    right_only = [c for c in right_keep if c not in left_cols]
    all_cols = list(left_cols) + right_only

    def pad_both(batch: pa.Table) -> pa.Table:
        lrows = batch.filter(left_filter(batch))
        rrows = batch.filter(right_filter(batch)) if right_filter else batch
        out = {}
        for c in all_cols:
            lcol = (
                lrows[c].combine_chunks()
                if c in left_cols
                else pa.nulls(len(lrows), types[c])
            )
            rcol = (
                rrows[c].combine_chunks()
                if c in right_keep
                else pa.nulls(len(rrows), types[c])
            )
            out[c] = pa.concat_arrays([lcol, rcol])
        out["_side"] = pa.array(["L"] * len(lrows) + ["R"] * len(rrows))
        out["_part"] = pa.array(
            hash_part(out[by].to_numpy(zero_copy_only=False), coarse)
        )
        return pa.table(out)

    unioned = ds.map_batches(
        pad_both, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return _asof_reduce(
        unioned, list(left_cols), {c: types[c] for c in left_cols},
        right_keep, right_value_cols, by, on, suffix, direction,
    )


def _asof_reduce(
    unioned, left_cols, ltypes, right_keep, right_value_cols, by, on,
    suffix, direction,
):
    """The shared reduce: one coarse shuffle by the join key, then ONE
    vectorized ``pd.merge_asof(by=key)`` per partition."""
    on_r = f"{on}{suffix}"
    # left integer columns become float64 in pandas once the union pads the
    # other side with nulls — restore them with the NULLABLE Int64 dtype
    # (a left row may itself carry nulls in an int column)
    left_int_cols = [
        c for c in left_cols if pa.types.is_integer(ltypes[c])
    ]

    # suffixed names for right value columns that collide with a left column
    # (mirrors merge_asof's suffixes=("", suffix) behavior)
    value_out_cols = [
        (c + suffix) if c in left_cols else c for c in right_value_cols
    ]
    expected_cols = left_cols + [on_r] + value_out_cols

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        left_all = group.loc[group["_side"] == "L", left_cols]
        for c in left_int_cols:
            left_all[c] = left_all[c].astype("Int64")
        # left-join contract: null-`on` (or null-`by`) rows can never match
        # but must SURVIVE with null match columns (the oracle keeps them
        # too).  Pad them to the FULL output schema so every group returns
        # identical columns (a group whose left rows are all null-ts would
        # otherwise emit a narrower frame).  merge_asof refuses null keys,
        # so they must be split out, not passed through.
        no_match = left_all[on].isna() | left_all[by].isna()
        null_on = left_all[no_match].copy()
        if not null_on.empty:
            # on_r must be NULL for every unmatchable row — including
            # null-BY rows whose own `on` is valid (where() keeps the
            # dtype while nulling everything that isn't already null)
            null_on[on_r] = null_on[on].where(null_on[on].isna())
            for c, oc in zip(right_value_cols, value_out_cols):
                if oc not in null_on.columns:
                    # reindex of an empty slice keeps the dtype where it can
                    # (upcasting int→float exactly like an unmatched merge row)
                    null_on[oc] = group[c].iloc[0:0].reindex(null_on.index)
        left = left_all[~no_match].sort_values(on, kind="stable")
        right = (
            group.loc[group["_side"] == "R", right_keep]
            .dropna(subset=[on, by])
            .sort_values(on, kind="stable")
        )
        if left.empty and null_on.empty:
            return left_all.iloc[0:0].reindex(columns=expected_cols)
        right = right.copy()
        for c in left_int_cols:  # merge_asof needs identical by/key dtypes
            if c in right.columns:
                right[c] = right[c].astype("Int64")
        right[on_r] = right[on]
        if left.empty:
            out = null_on
        else:
            out = pd.merge_asof(
                left, right, on=on, by=by, direction=direction,
                suffixes=("", suffix),
            )
            if not null_on.empty:
                out = pd.concat([out, null_on], ignore_index=True)
        out = out.reindex(columns=expected_cols)
        # null-free int columns go back to plain int64 (the nullable Int64
        # extension dtype would leak into the output schema otherwise)
        for c in left_int_cols:
            if not out[c].isna().any():
                out[c] = out[c].astype("int64")
        return out

    # one coarse-hash shuffle; ``pd.merge_asof(by=...)`` serves every key of
    # a partition in ONE vectorized call (no per-key Python)
    return unioned.groupby("_part").map_groups(per_key, batch_format="pandas")
