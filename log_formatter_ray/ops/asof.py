"""As-of join — a custom operator Ray Data does not ship.

Composition (the documented escape hatch): pad both sides to a common
schema, tag, union, shuffle ONCE by the join key, and run
``pd.merge_asof`` inside each sorted group.

Partitioning assumption (stated per the build contract): one group = one
key's full history on both sides, which must fit in a worker — true for
per-user/per-entity event streams; salt by coarse time range into
(key, epoch-bucket) with boundary overlap if a single key's history
exceeds worker memory.
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
            n = len(batch)
            out = {}
            for c in all_cols:
                if c in batch.column_names and c in keep:
                    out[c] = batch[c].combine_chunks()
                else:
                    t = ltypes.get(c) or types_other.get(c) or pa.string()
                    out[c] = pa.nulls(n, t)
            out["_side"] = pa.array([side] * n)
            return pa.table(out)

        return fn

    unioned = left_ds.map_batches(
        pad("L", left_cols, rtypes), batch_format="pyarrow"
    ).union(
        right_ds.map_batches(pad("R", right_keep, rtypes), batch_format="pyarrow")
    )

    on_r = f"{on}{suffix}"
    # left integer columns become float64 in pandas once the union pads the
    # other side with nulls — restore them (left rows themselves have no nulls)
    left_int_cols = [
        c for c in left_cols if pa.types.is_integer(ltypes[c])
    ]

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        left = (
            group.loc[group["_side"] == "L", left_cols]
            .dropna(subset=[on])
            .sort_values(on)
        )
        for c in left_int_cols:
            left[c] = left[c].astype("int64")
        right = (
            group.loc[group["_side"] == "R", right_keep]
            .dropna(subset=[on])
            .sort_values(on)
        )
        if left.empty:
            return left
        right = right.copy()
        right[on_r] = right[on]
        out = pd.merge_asof(
            left, right, on=on, by=by, direction=direction, suffixes=("", suffix)
        )
        return out

    return unioned.groupby(by).map_groups(per_key, batch_format="pandas")
