"""Windowed aggregation vs DuckDB / pandas oracles on the events table."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from log_formatter_ray.ops.window import session_windows, tumbling_window_count

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_ds():
    return rd.read_parquet(EVENTS)


def test_tumbling_hourly_matches_duckdb(events_ds):
    got = (
        tumbling_window_count(events_ds, unit="hour", keys=["event_type"])
        .to_pandas()
        .sort_values(["window", "event_type"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT date_trunc('hour', ts) AS window, event_type, COUNT(*) AS n "
        f"FROM '{EVENTS}' GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    assert got["window"].tolist() == exp["window"].tolist()
    assert got["n"].tolist() == exp["n"].astype(int).tolist()


def test_session_windows_matches_pandas(events_ds):
    gap = 1800.0
    got = (
        session_windows(events_ds, gap_s=gap)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    df = pq.read_table(EVENTS).to_pandas()

    rows = []
    for uid, g in df.sort_values("ts").groupby("user_id"):
        sid = (g["ts"].diff().dt.total_seconds().fillna(float("inf")) > gap).cumsum()
        for _, s in g.groupby(sid):
            rows.append(
                {
                    "user_id": uid,
                    "session_start": s["ts"].min(),
                    "session_end": s["ts"].max(),
                    "n_events": len(s),
                    "sum_value": s["value"].sum(),
                }
            )
    exp = (
        pd.DataFrame(rows)
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        exp[["user_id", "session_start", "session_end", "n_events"]],
        check_dtype=False,
    )
    # session row count conservation: Σ n_events == total events
    assert got["n_events"].sum() == len(df)


def test_sliding_window_matches_duckdb(events_ds):
    from log_formatter_ray.ops.window import sliding_window_count

    got = (
        sliding_window_count(events_ds, size_s=3600, slide_s=900, keys=["event_type"])
        .to_pandas()
        .sort_values(["window", "event_type"])
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                 + ((CAST(floor(epoch(ts)/900) AS BIGINT) - k) * 900) * INTERVAL '1 second' AS window,
               event_type, COUNT(*) AS n
        FROM '{EVENTS}' CROSS JOIN (SELECT unnest(range(4)) AS k) s
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["window"].tolist() == exp["window"].tolist()
    assert got["n"].tolist() == exp["n"].astype(int).tolist()
    # every event lands in exactly size/slide = 4 windows
    assert got["n"].sum() == 4 * 1000


def test_sliding_window_validates_ratio(events_ds):
    from log_formatter_ray.ops.window import sliding_window_count
    import pytest

    with pytest.raises(ValueError):
        sliding_window_count(events_ds, size_s=3600, slide_s=1000)


def test_topk_per_group(events_ds):
    from log_formatter_ray.ops.window import topk_per_group
    from log_formatter_ray.stages.aggregate import grouped_count

    counts = grouped_count(events_ds, ["event_type", "user_id"], count_alias="n")
    got = topk_per_group(counts, ["event_type"], "n", k=2, tiebreak_cols=["user_id"])
    df = got.to_pandas()
    assert df.groupby("event_type").size().max() == 2
    # top entries really are the max counts per group
    full = counts.to_pandas()
    for et, g in df.groupby("event_type"):
        best = full[full["event_type"] == et].sort_values(
            ["n", "user_id"], ascending=[False, True]
        ).head(2)
        assert sorted(g["user_id"]) == sorted(best["user_id"])


def test_asof_join_matches_pandas(events_ds):
    from log_formatter_ray.ops.asof import asof_join
    import pyarrow.compute as pc
    import pyarrow as pa

    purchases = events_ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]),
        batch_format="pyarrow")
    clicks = events_ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
            ["user_id", "ts", "value"]),
        batch_format="pyarrow")
    got = (
        asof_join(purchases, clicks, by="user_id", on="ts", right_value_cols=["value"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # pandas global-oracle
    full = pq.read_table(EVENTS).to_pandas()
    p = full[full.event_type == "purchase"][["event_id", "user_id", "ts"]].sort_values("ts")
    c = full[full.event_type == "click"][["user_id", "ts", "value"]].sort_values("ts")
    c = c.assign(ts_right=c["ts"])
    exp = pd.merge_asof(p, c, on="ts", by="user_id", direction="backward") \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "ts_right", "value"]],
        exp[["event_id", "ts_right", "value"]],
        check_dtype=False,
    )
    assert len(got) == len(p)  # every purchase kept (left join)
    assert got["event_id"].dtype == "int64"  # no float degradation


def test_asof_join_self_matches_two_input_form(events_ds):
    """The one-pass self-join form (single read, per-batch L+R tagging)
    must equal asof_join fed the same filtered branches."""
    from log_formatter_ray.ops.asof import asof_join, asof_join_self
    import pyarrow.compute as pc

    got = (
        asof_join_self(
            events_ds, by="user_id", on="ts", right_value_cols=["value"],
            left_filter=lambda t: pc.equal(t["event_type"], "purchase"),
            left_cols=["event_id", "user_id", "ts"],
            right_filter=lambda t: pc.equal(t["event_type"], "click"),
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    purchases = events_ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]),
        batch_format="pyarrow")
    clicks = events_ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
            ["user_id", "ts", "value"]),
        batch_format="pyarrow")
    exp = (
        asof_join(purchases, clicks, by="user_id", on="ts",
                  right_value_cols=["value"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_asof_join_all_null_ts_group():
    """A key whose left rows ALL have null `on` must emit each row ONCE with
    the full output schema (null match columns) — not twice with a narrower
    frame (ADVICE r01)."""
    from log_formatter_ray.ops.asof import asof_join
    import pyarrow as pa
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array(["u1", "u1", "u2"]),
        "ts": pa.array([None, None, 500], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array(["u2"]),
        "ts": pa.array([100], pa.timestamp("us")),
        "value": pa.array([7.0]),
    }))
    got = (
        asof_join(left, right, by="user_id", on="ts", right_value_cols=["value"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == 3  # null-ts rows exactly once
    assert sorted(got.columns) == ["event_id", "ts", "ts_right", "user_id", "value"]
    assert got.loc[got.event_id.isin([1, 2]), ["ts_right", "value"]].isna().all().all()
    assert got.loc[got.event_id == 3, "value"].iloc[0] == 7.0


def test_running_sequence_numbers(events_ds):
    from log_formatter_ray.ops.window import running_sequence_numbers

    got = (
        running_sequence_numbers(events_ds)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    full = pq.read_table(EVENTS).to_pandas()
    exp = full.sort_values(["ts", "event_id"]).copy()
    exp["k"] = exp.groupby("user_id").cumcount() + 1
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    # per-user sequence is 1..n
    m = got.groupby("user_id")["k"].agg(["min", "max", "count"])
    assert (m["min"] == 1).all() and (m["max"] == m["count"]).all()


def test_keyed_ops_null_key_semantics():
    """Null keys are real partitions (SQL PARTITION BY semantics): kept in
    topk/running-seq/sessionize, grouped as ONE key, and never float-upcast
    the outputs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.window import (
        running_sequence_numbers, session_windows, topk_per_group,
    )

    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "user_id": pa.array(["u1", "u1", None, None, "u2", None]),
        "ts": pa.array(
            np.array([0, 60, 10, 20, 5, 4000], dtype="datetime64[s]").astype(
                "datetime64[us]"
            )
        ),
        "value": pa.array([1.0] * 6),
    })
    ds = rd.from_arrow(t)

    seq = running_sequence_numbers(ds).to_pandas()
    assert len(seq) == 6
    assert seq["k"].dtype == "int64"
    null_rows = seq[seq["user_id"].isna()].sort_values("ts")
    assert null_rows["k"].tolist() == [1, 2, 3]  # one null-key partition

    sess = session_windows(ds, gap_s=1800.0).to_pandas()
    nt = sess[sess["user_id"].isna()]
    assert len(nt) == 2  # [10s,20s] and [4000s] sessions
    assert sorted(nt["n_events"].tolist()) == [1, 2]

    counts = pa.table({
        "user_id": pa.array(["u1", None, "u2"]),
        "n": pa.array([5, 9, 2], pa.int64()),
    })
    top = topk_per_group(rd.from_arrow(counts), ["user_id"], "n", k=1).to_pandas()
    assert len(top) == 3  # the null group survives


def test_asof_join_null_by_key_unmatched():
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.asof import asof_join

    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([None, "u1"]),
        "ts": pa.array([100, 200], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array(["u1"]),
        "ts": pa.array([50], pa.timestamp("us")),
        "value": pa.array([3.0]),
    }))
    got = (
        asof_join(left, right, by="user_id", on="ts", right_value_cols=["value"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == 2
    # null-by row: unmatched, ts_right must be NULL (not its own ts)
    assert got.loc[0, ["ts_right", "value"]].isna().all()
    assert got.loc[1, "value"] == 3.0
