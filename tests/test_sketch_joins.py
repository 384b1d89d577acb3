"""HLL sketch accuracy and semi/anti/bloom joins vs exact oracles."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from log_formatter_ray.ops.joins import BloomFilter, anti_join, bloom_semi_join, semi_join
from log_formatter_ray.ops.sketch import approx_distinct, hll_estimate, hll_merge, hll_sketch


def test_hll_accuracy_direct():
    values = [f"user-{i}" for i in range(20_000)] * 2  # 20k distinct, 40k rows
    est = hll_estimate(hll_sketch(values))
    assert abs(est - 20_000) / 20_000 < 0.05  # 4096 registers → ~1.6% σ


def test_hll_mergeability():
    a = hll_sketch([f"a{i}" for i in range(5000)])
    b = hll_sketch([f"a{i}" for i in range(2500, 7500)])  # 50% overlap
    est = hll_estimate(hll_merge(a, b))
    assert abs(est - 7500) / 7500 < 0.05


def test_approx_distinct_on_dataset():
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet").repartition(4)
    est = approx_distinct(ev, "user_id")
    exact = pq.read_table("/root/testdata/sf0.001/events.parquet")
    true = len(set(exact["user_id"].to_pylist()))
    assert abs(est - true) / true < 0.1


def test_approx_distinct_tree_reduce_invariant():
    """VERDICT r4 item 2: the two-level tree reduce must give the exact
    same register max (and hence the identical estimate) for any reduce
    shape — HLL merge is commutative/associative/idempotent."""
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet").repartition(16)
    base = approx_distinct(ev, "user_id")
    narrow = approx_distinct(ev, "user_id", reduce_width=2, merge_batch=3)
    assert base == narrow


@pytest.fixture()
def orders_ds():
    return rd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )


def test_semi_anti_join_exact(orders_ds):
    keys = list(range(1, 31))  # custkeys 1..30
    got_semi = semi_join(orders_ds, "o_custkey", keys).to_pandas()
    got_anti = anti_join(orders_ds, "o_custkey", keys).to_pandas()
    full = pq.read_table("/root/testdata/sf0.001/orders.parquet").to_pandas()
    exp_semi = full[full["o_custkey"].isin(keys)]
    assert sorted(got_semi["o_orderkey"]) == sorted(exp_semi["o_orderkey"])
    assert len(got_semi) + len(got_anti) == len(full)
    assert not set(got_anti["o_custkey"]) & set(keys)


def test_bloom_filter_properties():
    bf = BloomFilter(num_items=1000, fp_rate=0.01)
    members = [f"k{i}" for i in range(1000)]
    bf.add(members)
    assert bf.contains(members).all()  # NO false negatives, ever
    probes = [f"other{i}" for i in range(10_000)]
    fp = bf.contains(probes).mean()
    assert fp < 0.03  # ~1% target


def test_bloom_semi_join_superset_then_exact(orders_ds):
    int_keys = list(range(1, 31))
    bf = BloomFilter(num_items=30, fp_rate=0.01).add(int_keys)
    pre = bloom_semi_join(orders_ds, "o_custkey", bf)
    exact = semi_join(pre, "o_custkey", int_keys).to_pandas()
    full = pq.read_table("/root/testdata/sf0.001/orders.parquet").to_pandas()
    exp = full[full["o_custkey"].isin(int_keys)]
    # two-phase (bloom prefilter + exact) == exact
    assert sorted(exact["o_orderkey"]) == sorted(exp["o_orderkey"])


def test_semi_anti_join_empty_keys_and_nulls():
    t = pa.table({"k": pa.array(["a", "b", None], pa.string()), "v": [1, 2, 3]})
    ds = rd.from_arrow(t)
    # empty key set: semi → nothing, anti → everything EXCEPT null keys
    assert semi_join(ds, "k", []).count() == 0
    assert anti_join(ds, "k", []).to_pandas()["v"].tolist() == [1, 2]
    # null keys never match IN, and NOT IN drops them (SQL unknown)
    assert semi_join(ds, "k", ["a"]).to_pandas()["v"].tolist() == [1]
    assert sorted(anti_join(ds, "k", ["a"]).to_pandas()["v"].tolist()) == [2]


def test_range_count_join_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.joins import range_count_join

    rng = np.random.default_rng(3)
    n = 400
    ts = pa.array(
        (rng.integers(0, 10_000, n) * 1_000_000).astype("datetime64[us]")
    )
    users = pa.array([f"u{int(i)}" for i in rng.integers(0, 20, n)])
    ev = pa.table(
        {"event_id": pa.array(range(n), pa.int64()), "user_id": users, "ts": ts}
    )
    left = rd.from_arrow(ev.slice(0, 100))
    right = rd.from_arrow(ev)
    got = (
        range_count_join(left, right, by="user_id", on="ts", lo_s=0, hi_s=1000)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    df = ev.to_pandas()
    exp = []
    for _, a in df.head(100).iterrows():
        m = df[(df.user_id == a.user_id)
               & (df.ts > a.ts)
               & (df.ts <= a.ts + pd.Timedelta(seconds=1000))]
        exp.append(len(m))
    assert got["n_in_range"].tolist() == exp
    assert got["event_id"].dtype == "int64"


def test_range_count_join_self_matches_two_input_form():
    """The one-pass self-join form (single read, per-batch L+R tagging)
    must equal range_count_join fed the same filtered/full branches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from log_formatter_ray.ops.joins import range_count_join, range_count_join_self

    rng = np.random.default_rng(9)
    n = 600
    ts = pa.array(
        (rng.integers(0, 8_000, n) * 1_000_000).astype("datetime64[us]")
    )
    users = pa.array([f"u{int(i)}" for i in rng.integers(0, 15, n)])
    kinds = pa.array(
        np.array(["error", "click", "view"], object)[rng.integers(0, 3, n)]
    )
    ev = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": users,
            "ts": ts,
            "event_type": kinds,
        }
    )
    ds = rd.from_arrow(ev).repartition(5)
    got = (
        range_count_join_self(
            ds, by="user_id", on="ts", lo_s=0, hi_s=900,
            left_filter=lambda t: pc.equal(t["event_type"], "error"),
            left_cols=["event_id", "user_id", "ts"],
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    left = rd.from_arrow(
        ev.filter(pc.equal(ev["event_type"], "error")).select(
            ["event_id", "user_id", "ts"]
        )
    )
    right = rd.from_arrow(ev.select(["user_id", "ts"]))
    exp = (
        range_count_join(left, right, by="user_id", on="ts", lo_s=0, hi_s=900)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["n_in_range"].tolist() == exp["n_in_range"].tolist()


def test_approx_distinct_per_key_within_tolerance():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.sketch import approx_distinct_per_key

    rng = np.random.default_rng(2)
    kinds = np.array(["a", "b", "c"], dtype=object)
    keys = kinds[rng.integers(0, 3, 30_000)]
    # distinct cardinalities differ per key
    vals = np.where(
        keys == "a", rng.integers(0, 500, 30_000),
        np.where(keys == "b", rng.integers(0, 5_000, 30_000),
                 rng.integers(0, 50, 30_000)),
    )
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    got = (
        approx_distinct_per_key(rd.from_arrow(t).repartition(6), "k", "v")
        .to_pandas().set_index("k")["approx_n"]
    )
    import pandas as pd
    df = t.to_pandas()
    for k, exact in df.groupby("k")["v"].nunique().items():
        assert abs(got[k] - exact) / exact < 0.06, (k, got[k], exact)


def test_range_count_join_with_nulls_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.joins import range_count_join

    rng = np.random.default_rng(7)
    n = 300
    ts_vals = (rng.integers(0, 5_000, n) * 1_000_000).astype("datetime64[us]")
    ts_mask = rng.random(n) < 0.1  # 10% null timestamps
    ts = pa.array(ts_vals, mask=ts_mask)
    users = pa.array([f"u{int(i)}" for i in rng.integers(0, 12, n)])
    ev = pa.table(
        {"event_id": pa.array(range(n), pa.int64()), "user_id": users, "ts": ts}
    )
    left = rd.from_arrow(ev.slice(0, 80))
    right = rd.from_arrow(ev)
    got = (
        range_count_join(left, right, by="user_id", on="ts", lo_s=0, hi_s=600)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    df = ev.to_pandas()
    exp = []
    for _, a in df.head(80).iterrows():
        if pd.isna(a.ts):
            exp.append(0)
            continue
        m = df[(df.user_id == a.user_id) & df.ts.notna()
               & (df.ts > a.ts)
               & (df.ts <= a.ts + pd.Timedelta(seconds=600))]
        exp.append(len(m))
    assert got["n_in_range"].tolist() == exp


def test_approx_distinct_per_window_within_tolerance():
    """Tumbling-window × HLL composition: per-hour approx distinct within
    HLL tolerance of exact, null timestamps in their own window."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.sketch import approx_distinct_per_window

    rng = np.random.default_rng(4)
    n = 40_000
    hours = rng.integers(0, 4, n)  # 4 hourly windows
    ts_vals = (
        (hours * 3600 + rng.integers(0, 3600, n)) * 1_000_000
    ).astype("datetime64[us]")
    null_mask = rng.random(n) < 0.02
    users = np.array([f"u{int(i)}" for i in rng.integers(0, 3000, n)], object)
    t = pa.table(
        {
            "ts": pa.array(ts_vals, mask=null_mask),
            "user_id": pa.array(users),
        }
    )
    got = (
        approx_distinct_per_window(
            rd.from_arrow(t).repartition(6), "ts", "user_id", unit="hour"
        )
        .to_pandas()
    )
    df = t.to_pandas()
    df["w"] = df["ts"].dt.floor("h")
    exact = df.groupby("w", dropna=False)["user_id"].nunique()
    assert len(got) == len(exact)  # 4 hours + the null window
    got = got.set_index("window")["approx_n"]
    for w, ex in exact.items():
        key = w if not pd.isna(w) else pd.NaT
        g = got[key] if not pd.isna(w) else got[got.index.isna()].iloc[0]
        assert abs(g - ex) / ex < 0.06, (w, g, ex)


def test_approx_distinct_per_window_source_unit_preserved():
    """ADVICE r3: a timestamp[s] (or [ns]) ts column must come back as
    window labels in the SOURCE unit's true instants — the round-3 code
    reinterpreted source-unit int64 as microseconds."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.sketch import approx_distinct_per_window

    secs = np.array([0, 10, 3600, 3700, 7200], np.int64)
    users = ["a", "b", "a", "c", "a"]
    for unit in ("s", "ms", "ns"):
        scale = {"s": 1, "ms": 1_000, "ns": 1_000_000_000}[unit]
        t = pa.table(
            {
                "ts": pa.array(secs * scale, pa.timestamp(unit)),
                "user_id": pa.array(users),
            }
        )
        out = (
            approx_distinct_per_window(
                rd.from_arrow(t).repartition(2), "ts", "user_id", unit="hour"
            )
            .to_pandas()
            .sort_values("window")
            .reset_index(drop=True)
        )
        got = pd.to_datetime(out["window"]).tolist()
        exp = pd.to_datetime([0, 3600, 7200], unit="s").tolist()
        assert got == exp, (unit, got)
        assert out["approx_n"].tolist() == [2, 2, 1]


def test_tdigest_quantiles_within_tolerance():
    """t-digest accuracy on three shapes, merge-order invariance, and the
    one-pass distributed path (approx_quantiles)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.sketch import TDigest, approx_quantiles

    rng = np.random.default_rng(9)
    shapes = {
        "normal": rng.normal(100, 15, 80_000),
        "uniform": rng.uniform(-5, 5, 80_000),
        "lognormal": rng.lognormal(0, 1.5, 80_000),
    }
    for name, v in shapes.items():
        d = TDigest().add_array(v)
        for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
            got = d.quantile(q)
            exact = np.quantile(v, q)
            spread = np.quantile(v, 0.99) - np.quantile(v, 0.01)
            assert abs(got - exact) <= 0.02 * spread, (name, q, got, exact)

    # mergeability: 16 chunk digests merged == one-shot within tolerance
    v = shapes["normal"]
    parts = [TDigest().add_array(c) for c in np.array_split(v, 16)]
    acc = TDigest()
    for p in parts:
        acc.merge(p)
    assert abs(acc.n - len(v)) < 1e-6
    assert abs(acc.quantile(0.5) - np.quantile(v, 0.5)) <= 1.0

    # the distributed one-pass path, with NaNs ignored
    withnan = np.r_[v, [np.nan] * 50]
    ds = rd.from_arrow(
        pa.table({"v": pa.array(withnan, pa.float64())})
    ).repartition(8)
    got50, got95 = approx_quantiles(ds, "v", [0.5, 0.95])
    assert abs(got50 - np.quantile(v, 0.5)) <= 1.0
    assert abs(got95 - np.quantile(v, 0.95)) <= 1.5

    # empty / tiny digests
    assert np.isnan(TDigest().quantile(0.5))
    assert TDigest().add_array(np.array([7.0])).quantile(0.9) == 7.0


def test_tdigest_per_key_within_tolerance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from log_formatter_ray.ops.sketch import approx_quantiles_per_key

    rng = np.random.default_rng(12)
    frames = []
    for k, (mu, sd, n) in {"a": (0, 1, 50_000), "b": (100, 20, 30_000),
                           "c": (-50, 5, 2_000)}.items():
        frames.append(pd.DataFrame({"k": k, "v": rng.normal(mu, sd, n)}))
    df = pd.concat(frames, ignore_index=True)
    out = (
        approx_quantiles_per_key(
            rd.from_pandas(df).repartition(8), "k", "v", [0.5, 0.95]
        )
        .to_pandas().set_index("k")
    )
    for k, sub in df.groupby("k"):
        spread = sub["v"].quantile(0.99) - sub["v"].quantile(0.01)
        for q, c in [(0.5, "q_0_5"), (0.95, "q_0_95")]:
            exact = sub["v"].quantile(q)
            assert abs(out.loc[k, c] - exact) <= 0.02 * spread, (k, q)


def test_heavy_hitters_guarantee_and_bounds():
    """Misra-Gries top-k: planted heavy items always surface, reported
    counts bracket the truth (lower <= true <= upper), memory bounded by
    m regardless of key cardinality."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from log_formatter_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(13)
    # 200k rows: 5 heavy values (5% each) over a 100k-value uniform tail
    heavy = [f"H{i}" for i in range(5)]
    n = 200_000
    vals = np.array(
        [heavy[rng.integers(0, 5)] if rng.random() < 0.25
         else f"t{rng.integers(0, 100_000)}" for _ in range(n)],
        object,
    )
    true = pd.Series(vals).value_counts()
    ds = rd.from_arrow(pa.table({"u": pa.array(vals)})).repartition(8)
    got_vals, lower, upper = heavy_hitters(ds, "u", k=5, m=2048)
    assert set(heavy) <= set(got_vals)  # every planted heavy item surfaces
    for v, lo, hi in zip(got_vals, lower, upper):
        assert lo <= true[v] <= hi, (v, lo, true[v], hi)
