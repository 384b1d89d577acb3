"""Windowed aggregation over an event-time table.

The reference has NO event-time processing (SURVEY.md §2.4 — FIFO channels
only); these operators cover the stream-shaped workloads a telemetry corpus
needs, on Ray Data's batch model: tumbling windows are a pure column
computation (floor the timestamp) + partial-agg groupby; session windows
group by key and window inside the sorted group.

Partitioning assumption (documented per the build contract): session
windowing shuffles by ``key`` — one group = one user's events, which must
fit in a worker (true for per-user event streams; salt by time range if a
single key's history exceeds worker memory).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from log_formatter_ray.stages.aggregate import grouped_count

_UNITS = {"second": "second", "minute": "minute", "hour": "hour", "day": "day"}


def add_tumbling_window(
    batch: pa.Table, ts_col: str = "ts", unit: str = "hour", out_col: str = "window"
) -> pa.Table:
    """Tumbling window id = timestamp floored to ``unit`` (DuckDB
    ``date_trunc`` parity)."""
    w = pc.floor_temporal(batch[ts_col], unit=_UNITS[unit])
    return batch.append_column(out_col, w.combine_chunks())


def tumbling_window_count(
    ds,
    ts_col: str = "ts",
    unit: str = "hour",
    keys: list[str] | None = None,
    count_alias: str = "n",
    sum_cols: dict[str, str] | None = None,
):
    """Per-(window[, keys]) counts/sums with partial pre-aggregation —
    windows never shuffle raw events, only per-block partials."""
    keys = keys or []

    def floor_as_int(b: pa.Table) -> pa.Table:
        b = add_tumbling_window(b, ts_col=ts_col, unit=unit)
        # int64 micros through the shuffle: Ray's sort-based groupby pickles
        # nullable timestamp keys to binary objects and degrades precision;
        # ints group/sort natively and ``recast`` restores timestamp[us].
        i = b.column_names.index("window")
        return b.set_column(i, "window", pc.cast(b["window"], pa.int64()))

    win = ds.map_batches(floor_as_int, batch_format="pyarrow", batch_size=None)
    agg = grouped_count(win, ["window", *keys], count_alias=count_alias, sum_cols=sum_cols)

    def recast(t: pa.Table) -> pa.Table:
        i = t.column_names.index("window")
        return t.set_column(i, "window", pc.cast(t["window"], pa.timestamp("us")))

    return agg.map_batches(recast, batch_format="pyarrow")


def sliding_window_count(
    ds,
    ts_col: str = "ts",
    size_s: int = 3600,
    slide_s: int = 900,
    keys: list[str] | None = None,
    count_alias: str = "n",
):
    """Sliding windows of ``size_s`` seconds every ``slide_s`` seconds
    (``size_s`` must be a multiple of ``slide_s``).

    Each event belongs to exactly ``size_s/slide_s`` windows; the explode is
    a vectorized ``np.repeat`` inside ``map_batches`` (rows × r small key
    rows, no payload), then the usual partial-agg count.  Window id =
    window START timestamp.
    """
    import numpy as np

    if size_s % slide_s:
        raise ValueError("size_s must be a multiple of slide_s")
    r = size_s // slide_s
    keys = keys or []

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].combine_chunks()
        n = len(batch)
        valid = pc.is_valid(ts).to_numpy(zero_copy_only=False)
        epoch_us = np.zeros(n, dtype=np.int64)
        if valid.any():
            epoch_us[valid] = ts.drop_null().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        base = (epoch_us // (slide_s * 1_000_000)) * slide_s  # seconds
        starts = np.repeat(base, r) - np.tile(
            np.arange(r, dtype=np.int64) * slide_s, n
        )
        # null timestamps → null window (SQL date arithmetic on NULL).
        # Kept as INT64 micros through the shuffle: Ray's sort-based groupby
        # pickles nullable timestamp keys into binary objects; ints with
        # nulls sort natively.  ``recast`` restores timestamp[us] at the end.
        win = pa.array(starts * 1_000_000, mask=~np.repeat(valid, r))
        cols = {"window": win}
        for k in keys:
            col = batch[k].combine_chunks()
            cols[k] = col.take(pa.array(np.repeat(np.arange(n), r)))
        return pa.table(cols)

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    agg = grouped_count(exploded, ["window", *keys], count_alias=count_alias)

    def recast(t: pa.Table) -> pa.Table:
        i = t.column_names.index("window")
        return t.set_column(i, "window", pc.cast(t["window"], pa.timestamp("us")))

    return agg.map_batches(recast, batch_format="pyarrow")


def topk_per_group(
    ds,
    group_keys: list[str],
    order_col: str,
    k: int = 3,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
    coarse: int = 256,
):
    """Top-k rows per group by ``order_col`` with deterministic tie-break
    (``tiebreak_cols`` ascending).  Shuffles by a coarse hash of
    ``group_keys``; inside each partition one vectorized
    sort + ``groupby().head(k)`` serves ALL its groups (no per-group
    Python)."""
    from log_formatter_ray.ops._shuffle import PART_COL, add_coarse_part

    tiebreak_cols = tiebreak_cols or []
    tagged = add_coarse_part(ds, list(group_keys), coarse)

    def head(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(
            [*group_keys, order_col, *tiebreak_cols],
            ascending=[True] * len(group_keys)
            + [not descending]
            + [True] * len(tiebreak_cols),
        )
        return (
            # dropna=False: a null group key is a real group (SQL PARTITION
            # BY keeps the NULL partition; Ray's own groupby did too)
            g.groupby(list(group_keys), sort=False, group_keys=False,
                      dropna=False)
            .head(k)
            .drop(columns=[PART_COL])
        )

    return tagged.groupby(PART_COL).map_groups(head, batch_format="pandas")


def running_sequence_numbers(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "k",
    coarse: int = 256,
):
    """Ordered per-key processing: 1-based sequence number of each row
    within its key's timeline (ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY ts, id)).  One coarse-hash shuffle; sequence numbers come
    from one vectorized sort + ``groupby().cumcount()`` per partition —
    exactly the ordered-log assumption of stream processing on a batch
    engine, without per-key Python."""
    from log_formatter_ray.ops._shuffle import PART_COL, add_coarse_part

    tagged = add_coarse_part(ds, [key], coarse)

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([key, ts_col, id_col]).copy()
        # dropna=False keeps the null-key partition numbered (and keeps
        # the sequence column int64 — NaN would float64-upcast it)
        g[out_col] = g.groupby(key, sort=False, dropna=False).cumcount() + 1
        return g.drop(columns=[PART_COL])

    return tagged.groupby(PART_COL).map_groups(per_part, batch_format="pandas")


def session_windows(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800.0,
    value_col: str | None = "value",
    coarse: int = 256,
):
    """Per-key session windows (new session when the inter-event gap exceeds
    ``gap_s``); returns one row per session: key, session_start, session_end,
    n_events[, sum_<value_col>].

    Coarse-hash shuffle; session boundaries for ALL keys of a partition
    come from one vectorized pass (key-change OR gap flag → cumsum →
    pandas groupby agg)."""
    from log_formatter_ray.ops._shuffle import PART_COL, add_coarse_part

    tagged = add_coarse_part(ds, [key], coarse)

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = part.sort_values([key, ts_col])
        # factorize treats ALL null keys as one key (NaN != NaN would make
        # every null row its own session); null/NaT timestamps start a new
        # session (diff is NaN → inf), matching the per-key original
        codes = pd.factorize(g[key], use_na_sentinel=False)[0]
        new_key = np.r_[True, codes[1:] != codes[:-1]] if len(g) else np.zeros(0, bool)
        gaps = g[ts_col].diff().dt.total_seconds().fillna(np.inf)
        sid = (new_key | (gaps > gap_s).to_numpy()).cumsum()
        named = {
            "session_start": (ts_col, "min"),
            "session_end": (ts_col, "max"),
            "n_events": (ts_col, "count"),
        }
        if value_col:
            named[f"sum_{value_col}"] = (value_col, "sum")
        res = (
            g.assign(_sid=sid)
            .groupby([key, "_sid"], sort=False, dropna=False)
            .agg(**named)
            .reset_index()
            .drop(columns=["_sid"])
        )
        res["n_events"] = res["n_events"].astype("int64")
        return res

    return tagged.groupby(PART_COL).map_groups(per_part, batch_format="pandas")
