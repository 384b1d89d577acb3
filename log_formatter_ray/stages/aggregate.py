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


def _arrow_type(t, fallback: pa.DataType) -> pa.DataType:
    """Coerce a Dataset schema type to pyarrow: pandas-block datasets
    report numpy dtypes / python ``object`` instead of ``pa.DataType``."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except Exception:
        return fallback


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
            # null-safe group boundaries: NaN != NaN would make every
            # null-key row its own group (float key columns) — treat two
            # nulls as equal
            sh = kdf.shift()
            newg = (
                (kdf != sh) & ~(kdf.isna() & sh.isna())
            ).any(axis=1).to_numpy()
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
    mode: str = "exact",
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
    part is.

    ``mode``: ``"exact"`` is the (value, count) partial plan above — right
    whenever |distinct values| ≪ rows (integers, discretized floats,
    strings).  ``"binned"`` routes to :func:`grouped_quantile_binned` —
    same exact result, bounded shuffle even when every float value is
    distinct.  ``"auto"`` picks binned for floating-point value columns.
    """
    import pyarrow.compute as _pc

    from log_formatter_ray.ops._shuffle import PART_COL, add_coarse_part

    keys = list(keys)
    schema_types = dict(zip(ds.schema().names, ds.schema().types))
    value_type = _arrow_type(schema_types[value_col], pa.float64())
    if mode == "auto":
        mode = "binned" if pa.types.is_floating(value_type) else "exact"
    if mode == "binned":
        return grouped_quantile_binned(ds, keys, value_col, q, out_col,
                                       coarse=coarse)
    if pa.types.is_null(value_type):  # corpus-wide all-null value column
        value_type = pa.float64()
    key_types = {}
    for k in keys:
        kt = _arrow_type(schema_types[k], pa.string())
        key_types[k] = pa.string() if pa.types.is_null(kt) else kt

    def partial(batch: pa.Table) -> pa.Table:
        # per-block normalization: an all-null pandas-sourced block arrives
        # with null-typed columns regardless of the dataset schema — cast
        # the value AND key columns so every block's partials concat/union
        # under ONE schema
        for col, want in [(value_col, value_type)] + list(key_types.items()):
            if batch[col].type != want:
                i = batch.column_names.index(col)
                batch = batch.set_column(i, col, batch[col].cast(want))
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


def grouped_quantile_binned(
    ds,
    keys: list[str],
    value_col: str,
    q: float,
    out_col: str,
    bins: int = 4096,
    coarse: int = 256,
):
    """EXACT grouped discrete quantile for CONTINUOUS value columns with a
    bounded shuffle (VERDICT r3 item 5): the exact (value, count) partial
    plan degenerates when |distinct values| ≈ rows (a raw float64 column),
    because its "tiny partials" become the corpus.  This plan's shuffle
    volume is ≤ keys × ``bins`` histogram rows plus the winning bin's rows
    — independent of value cardinality — and the result is still the exact
    ``quantile_disc`` data value, so it stays oracle-checkable:

    1. **stats pass** — per-block ``group_by(keys)`` min/max/count
       partials → one tiny groupby → per-key bin edges (driver holds one
       row per key; key cardinality bounded by assumption — a
       high-cardinality key column implies few rows per key, which is the
       exact plan's sweet spot instead).
    2. **histogram pass** — per-block counts over ``bins`` uniform per-key
       bins → ``groupby(keys, bin).sum`` (≤ keys × bins rows) → the
       winning bin (first with cumulative ≥ ⌈q·n⌉) and the residual rank
       within it, computed per key inside coarse partitions.
    3. **refine pass** — only rows falling in their key's winning bin
       (expected n/bins per key; heavy duplicates collapse right back to
       (value, count) partials) → exact read-off at the residual rank.

    Bin assignment ``floor((v-min)·bins/(max-min))`` is monotone in v, so
    histogram ranks and in-bin ranks compose exactly; all three passes use
    the identical formula, so assignment is consistent.
    """
    import pyarrow.compute as _pc

    import ray
    import ray.data as rd

    from log_formatter_ray.ops._shuffle import PART_COL, add_coarse_part

    keys = list(keys)
    schema_types = dict(zip(ds.schema().names, ds.schema().types))
    value_type = _arrow_type(schema_types[value_col], pa.float64())
    if pa.types.is_null(value_type):
        value_type = pa.float64()
    out_pa_type = pa.int64() if pa.types.is_integer(value_type) else pa.float64()

    # ---- pass 1: per-key min / max / non-null count ----------------------
    def stats_partial(batch: pa.Table) -> pa.Table:
        if batch[value_col].type != value_type:
            i = batch.column_names.index(value_col)
            batch = batch.set_column(
                i, value_col, batch[value_col].cast(value_type)
            )
        t = batch.group_by(keys).aggregate(
            [(value_col, "min"), (value_col, "max"), (value_col, "count")]
        )
        return pa.table(
            {
                **{k: t[k] for k in keys},
                "_mn": t[f"{value_col}_min"].cast(pa.float64()),
                "_mx": t[f"{value_col}_max"].cast(pa.float64()),
                "_n": t[f"{value_col}_count"].cast(pa.int64()),
            }
        )

    # NOTE every shuffle in this plan groups by the int32 coarse hash
    # part, never by the raw key columns — Ray's sort-based groupby cannot
    # order a null key against a string/float (the same constraint the
    # exact plan's docstring records for the value column)
    def reduce_stats(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, dropna=False, as_index=False).agg(
            _mn=("_mn", "min"), _mx=("_mx", "max"), _n=("_n", "sum")
        )

    stats = (
        add_coarse_part(
            ds.map_batches(stats_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True),
            keys, coarse=coarse,
        )
        .groupby(PART_COL)
        .map_groups(reduce_stats, batch_format="pandas")
        .to_pandas()
    )
    nn = stats[stats["_n"] > 0].reset_index(drop=True)
    null_keys = stats[stats["_n"] == 0][keys].reset_index(drop=True)

    def _null_rows(kdf: pd.DataFrame) -> pa.Table:
        cols = {k: pa.Array.from_pandas(kdf[k]) for k in keys}
        cols[out_col] = pa.nulls(len(kdf), out_pa_type)
        return pa.table(cols)

    if not len(nn):
        return rd.from_arrow(_null_rows(null_keys))

    def _bin_of(v: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
        """The ONE bin formula all passes share (monotone, clamped)."""
        w = mx - mn
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.floor((v - mn) * (bins / np.where(w > 0, w, 1.0)))
        return np.clip(b, 0, bins - 1).astype(np.int64)

    stats_ref = ray.put(nn)

    def _merge_stats(batch: pa.Table) -> pd.DataFrame:
        """Rows with their key's (mn, mx) attached via one vectorized
        merge against the broadcast stats; null-value and unknown-key rows
        drop out."""
        sub = batch.select(keys + [value_col]).filter(
            _pc.is_valid(batch[value_col])
        )
        df = sub.to_pandas()
        return df.merge(ray.get(stats_ref), on=keys, how="inner")

    # ---- pass 2: per-(key, bin) histogram --------------------------------
    empty_keys = {k: nn[k].iloc[:0] for k in keys}

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = _merge_stats(batch)
        if len(df):
            df["_bin"] = _bin_of(
                df[value_col].to_numpy(np.float64),
                df["_mn"].to_numpy(), df["_mx"].to_numpy(),
            )
        else:
            df = pd.DataFrame(
                {**empty_keys, "_bin": np.array([], np.int64)}
            )
        t = pa.Table.from_pandas(
            df[keys + ["_bin"]], preserve_index=False
        ).group_by(keys + ["_bin"]).aggregate([([], "count_all")])
        return pa.table(
            {
                **{k: t[k] for k in keys},
                "_bin": t["_bin"].cast(pa.int64()),
                "_cnt": t["count_all"].cast(pa.int64()),
            }
        )

    def reduce_hist(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys + ["_bin"], dropna=False, as_index=False)[
            "_cnt"
        ].sum()

    hist = (
        add_coarse_part(
            ds.map_batches(hist_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True),
            keys, coarse=coarse,
        )
        .groupby(PART_COL)
        .map_groups(reduce_hist, batch_format="pandas")
        .to_pandas()
        .sort_values(keys + ["_bin"], kind="stable")
        .reset_index(drop=True)
    )
    # winning bin + residual rank per key (≤ keys × bins rows — driver-ok)
    g = hist.groupby(keys, dropna=False, sort=False)
    cum = g["_cnt"].cumsum().to_numpy()
    total = g["_cnt"].transform("sum").to_numpy()
    t_rank = np.maximum(np.ceil(q * total).astype(np.int64), 1)
    win = hist.assign(
        _cum_before=cum - hist["_cnt"].to_numpy(), _t=t_rank,
        _reach=cum >= t_rank,
    )
    win = win[win["_reach"]].groupby(keys, dropna=False, sort=False,
                                     as_index=False).first()
    win["_r"] = win["_t"] - win["_cum_before"]  # 1-based rank inside bin
    win = win[keys + ["_bin", "_r"]]
    win_ref = ray.put(win)

    # ---- pass 3: exact read-off inside each key's winning bin ------------
    def refine_partial(batch: pa.Table) -> pa.Table:
        df = _merge_stats(batch)
        if len(df):
            df["_bin"] = _bin_of(
                df[value_col].to_numpy(np.float64),
                df["_mn"].to_numpy(), df["_mx"].to_numpy(),
            )
            m = df.merge(
                ray.get(win_ref)[keys + ["_bin"]],
                on=keys + ["_bin"], how="inner",
            )
        else:
            m = pd.DataFrame(
                {**empty_keys,
                 value_col: pd.Series(np.array([], np.float64))}
            )
        t = pa.Table.from_pandas(
            m[keys + [value_col]], preserve_index=False
        )
        if t[value_col].type != value_type:
            t = t.set_column(
                t.column_names.index(value_col), value_col,
                t[value_col].cast(value_type),
            )
        t = t.group_by(keys + [value_col]).aggregate([([], "count_all")])
        return pa.table(
            {
                **{k: t[k] for k in keys},
                value_col: t[value_col],
                "_cnt": t["count_all"].cast(pa.int64()),
            }
        )

    refined = ds.map_batches(
        refine_partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    tagged = add_coarse_part(refined, keys, coarse=coarse)
    out_dtype = "Int64" if pa.types.is_integer(value_type) else "Float64"

    def readoff(gdf: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(win_ref)
        gg = gdf.sort_values(keys + [value_col], kind="stable")
        m = gg.merge(w[keys + ["_r"]], on=keys, how="left")
        sh = m[keys]
        shp = sh.shift()
        newg = ((sh != shp) & ~(sh.isna() & shp.isna())).any(axis=1).to_numpy()
        if len(newg):
            newg[0] = True
        gid = np.cumsum(newg) - 1
        c = m["_cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        start_idx = np.flatnonzero(newg)
        grp_off = np.zeros(len(start_idx), np.int64)
        grp_off[1:] = cum[start_idx[1:] - 1]
        within = cum - grp_off[gid]
        r = m["_r"].to_numpy(np.int64)
        prev = within - c
        sel = (prev < r) & (within >= r)
        picked = m.loc[sel, keys + [value_col]].copy()
        picked[value_col] = picked[value_col].astype(out_dtype)
        return picked.rename(columns={value_col: out_col})

    result = tagged.groupby(PART_COL).map_groups(
        readoff, batch_format="pandas"
    )

    def finalize(t: pa.Table) -> pa.Table:
        target = pa.int64() if pa.types.is_integer(value_type) else pa.float64()
        return pa.table(
            {
                c: (t[out_col].cast(target) if c == out_col
                    else t[c].combine_chunks())
                for c in t.column_names
            }
        )

    result = result.map_batches(
        finalize, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    if len(null_keys):
        result = result.union(rd.from_arrow(_null_rows(null_keys)))
    return result


def corpus_quantile_disc(ds, value_col: str, q: float, mode: str = "exact"):
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
        ["_k"], value_col, q, "_q", coarse=1, mode=mode,
    )
    rows = out.take_all()
    if not rows or rows[0]["_q"] is None:
        return None
    return rows[0]["_q"]
