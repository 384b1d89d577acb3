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
