"""Aggregate stage — partial (combiner) aggregation before the shuffle.

The reference's only aggregation is per-queue prometheus counters
(/root/reference/agent/connector/queue.go:24-59); the rebuild's contract is
grouped per-sink × source counts (BASELINE.json north_star).

Scale design: a bare ``groupby(keys).aggregate(...)`` shuffles EVERY row —
at 10^12 sequences with Zipf-skewed ``source`` that is both an all-to-all
exchange of the full corpus and a hot-key problem.  Instead each batch is
collapsed to at most |distinct keys in batch| partial rows with Arrow's
hash aggregation (``Table.group_by``), and only those partials — a few
hundred rows per block regardless of block size — go through the final
``groupby``.  Pre-aggregation also *defuses key skew*: the final shuffle
sees one row per (block × key), uniform by construction, so no salting is
needed on top; salting would only matter if partials themselves were huge
(keys ≫ rows/block), which counts-by-source is not.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum


def _partial_agg_fn(keys: list[str], count_alias: str, sum_cols: dict[str, str]):
    aggs = [([], "count_all")] + [(c, "sum") for c in sum_cols]
    renames = {"count_all": count_alias}
    renames.update({f"{c}_sum": alias for c, alias in sum_cols.items()})

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(keys).aggregate(aggs)
        return t.rename_columns([renames.get(c, c) for c in t.column_names])

    return partial


def grouped_count(
    ds,
    keys: list[str],
    count_alias: str = "n",
    sum_cols: dict[str, str] | None = None,
):
    """``SELECT keys, COUNT(*) AS count_alias[, SUM(c) AS alias ...] GROUP BY keys``
    with per-block partial aggregation; returns a (small) Dataset.

    ``sum_cols`` maps source column → output alias.
    """
    sum_cols = sum_cols or {}
    partials = ds.map_batches(
        _partial_agg_fn(list(keys), count_alias, sum_cols),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    aggs = [Sum(count_alias, alias_name=count_alias)]
    aggs += [Sum(alias, alias_name=alias) for alias in sum_cols.values()]
    return partials.groupby(list(keys)).aggregate(*aggs)


def _quantile_readoff(key_cols: list[str], value_col: str, cnt_col: str,
                      qfrac: float, out_col: str, out_dtype: str):
    """Per coarse partition: pick each key's discrete quantile off the
    cumulative (key, value, count) runs — fully vectorized (one sort + one
    boolean pick per partition, never one Python call per key).

    Dtype discipline: the quantile is "an actual data value", so integer
    inputs come back through pandas nullable ``Int64`` (exact for the full
    int64 range — a float64 round-trip would corrupt values ≥ 2^53) and
    float inputs as float64.  Rows with ``cnt == 0`` are key-presence
    markers (dummy value), excluded from the quantile but kept so an
    all-null key still emits a null result.  The missing-key fill uses a
    keys-only merge + typed concat, never a merge that would upcast the
    value column."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        all_keys = g[key_cols].drop_duplicates()
        gg = g[g[cnt_col] > 0].sort_values(
            key_cols + [value_col], kind="stable"
        )
        if len(gg):
            c = gg[cnt_col].to_numpy(np.int64)
            kdf = gg[key_cols]
            newg = (kdf != kdf.shift()).any(axis=1).to_numpy()
            newg[0] = True
            gid = np.cumsum(newg) - 1
            cum = np.cumsum(c)
            start_idx = np.flatnonzero(newg)
            grp_off = np.zeros(len(start_idx), np.int64)
            grp_off[1:] = cum[start_idx[1:] - 1]
            within = cum - grp_off[gid]
            last_idx = np.r_[start_idx[1:] - 1, len(gg) - 1]
            totals = within[last_idx]
            # discrete quantile = the element at 0-based rank ⌈q·n⌉−1
            # (verified: DuckDB quantile_disc picks exactly this index)
            target = np.maximum(
                np.ceil(qfrac * totals).astype(np.int64) - 1, 0
            )
            t_row = target[gid] + 1  # 1-based rank the row must reach
            prev = within - c
            sel = (prev < t_row) & (within >= t_row)
            picked = gg.loc[sel, key_cols + [value_col]].copy()
            picked[value_col] = picked[value_col].astype(out_dtype)
            # keys with zero non-null values: keys-only anti-merge (the
            # value column never participates, so no upcast)
            marked = all_keys.merge(
                picked[key_cols], on=key_cols, how="left", indicator=True
            )
            missing = all_keys[
                (marked["_merge"] == "left_only").to_numpy()
            ].copy()
            missing[value_col] = pd.array(
                [pd.NA] * len(missing), dtype=out_dtype
            )
            out = pd.concat([picked, missing], ignore_index=True)
        else:  # every value of every key in this partition is null
            out = all_keys.copy()
            out[value_col] = pd.array([pd.NA] * len(out), dtype=out_dtype)
        return out.rename(columns={value_col: out_col})

    return fn


def grouped_quantile_disc(
    ds,
    keys: list[str],
    value_col: str,
    q: float,
    out_col: str,
    coarse: int = 256,
):
    """Grouped DISCRETE quantile (SQL ``quantile_disc``) without ever
    gathering a key's raw rows in one worker: per-block (keys, value)
    value-count partials collapse the corpus to a tiny (key, value, count)
    table (a hot key contributes |distinct values| rows, not its row
    count), then the quantile is read off the cumulative counts inside a
    COARSE key-hash partition — skew-proof by construction, the same plan
    ``q_median_chars_per_lang`` uses.  Null values are ignored per key;
    an all-null key yields NaN (SQL semantics).

    One read, ONE shuffle: each block emits its (keys, value, count)
    partials for non-null values PLUS keys-only presence rows (value=null,
    count=0, so an all-null key still surfaces), and the read-off works
    directly on unmerged partials — split counts for the same (key,
    value) accumulate correctly in the cumulative pass, so no intermediate
    merge groupby is needed.  The value column never becomes a shuffle
    SORT key (Ray's sort-based groupby cannot order a null against a
    float — found by the hypothesis property test); only the int32 coarse
    part is."""
    import pyarrow.compute as _pc

    from log_formatter_ray.ops._shuffle import PART_COL, add_coarse_part

    keys = list(keys)
    value_type = dict(zip(ds.schema().names, ds.schema().types))[value_col]
    if pa.types.is_null(value_type):  # corpus-wide all-null value column
        value_type = pa.float64()

    def partial(batch: pa.Table) -> pa.Table:
        # per-block normalization: an all-null pandas-sourced block arrives
        # with a null-typed value column regardless of the dataset schema —
        # cast so every block's partials concat/union under ONE schema
        if batch[value_col].type != value_type:
            i = batch.column_names.index(value_col)
            batch = batch.set_column(
                i, value_col, batch[value_col].cast(value_type)
            )
        nn = batch.filter(_pc.is_valid(batch[value_col]))
        t1 = nn.group_by(keys + [value_col]).aggregate([([], "count_all")])
        t2 = batch.group_by(keys).aggregate([([], "count_all")])
        out1 = pa.table(
            {**{k: t1[k] for k in keys}, value_col: t1[value_col],
             "_cnt": t1["count_all"].cast(pa.int64())}
        )
        # key-presence rows: DUMMY value + cnt=0, never a null (a null in
        # an int64 value column would float64-upcast the whole column in
        # the pandas read-off, corrupting values >= 2^53)
        dummy = (
            pa.array(np.zeros(len(t2), np.int64)).cast(value_type)
            if pa.types.is_integer(value_type) or pa.types.is_floating(value_type)
            else pa.nulls(len(t2), value_type)
        )
        out2 = pa.table(
            {**{k: t2[k] for k in keys},
             value_col: dummy,
             "_cnt": pa.array(np.zeros(len(t2), np.int64))}
        )
        return pa.concat_tables([out1, out2])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    tagged = add_coarse_part(partials, keys, coarse=coarse)
    out_dtype = "Int64" if pa.types.is_integer(value_type) else "Float64"
    out = tagged.groupby(PART_COL).map_groups(
        _quantile_readoff(keys, value_col, "_cnt", q, out_col, out_dtype),
        batch_format="pandas",
    )
    # normalize the pandas nullable extension dtype to the plain Arrow
    # type (int64 / float64, nullable at the Arrow level) so consumers
    # and the oracle gate see ordinary dtypes
    target = pa.int64() if pa.types.is_integer(value_type) else pa.float64()

    def finalize(t: pa.Table) -> pa.Table:
        # rebuild (not set_column): the pandas-extension schema METADATA
        # survives set_column and would make to_pandas restore Float64
        return pa.table(
            {
                c: (
                    t[out_col].cast(target)
                    if c == out_col
                    else t[c].combine_chunks()
                )
                for c in t.column_names
            }
        )

    return out.map_batches(
        finalize, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def corpus_quantile_disc(ds, value_col: str, q: float):
    """CORPUS-WIDE discrete quantile (SQL ``quantile_disc`` with no GROUP
    BY) as a driver scalar — the first pass of a two-pass global
    percentile filter.

    Same scale shape as :func:`grouped_quantile_disc` (which it wraps with
    a constant key): the corpus collapses to per-block (value, count)
    partials — at most |distinct values| rows per block ever shuffle, the
    raw rows never do — and the read-off touches only the tiny partial
    table.  Returns a Python scalar (int for integer columns, float
    otherwise; ``None`` if every value is null).
    """
    def add_key(b: pa.Table) -> pa.Table:
        return b.append_column("_k", pa.array(np.zeros(len(b), np.int8)))

    out = grouped_quantile_disc(
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["_k"], value_col, q, "_q", coarse=1,
    )
    rows = out.take_all()
    if not rows or rows[0]["_q"] is None:
        return None
    return rows[0]["_q"]
