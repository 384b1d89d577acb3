"""Deterministic hash-based sampling / splitting."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from log_formatter_ray.ops.dedup import _stable_hash64
from log_formatter_ray.ops.sample import (
    reservoir_top_hash,
    sample_by_hash,
    split_by_hash,
)


def _docs(n=2000):
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:06d}" for i in range(n)]),
            "x": pa.array(range(n), pa.int64()),
        }
    )


def test_split_by_hash_stable_across_parallelism():
    t = _docs()
    a = (
        split_by_hash(rd.from_arrow(t).repartition(2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        split_by_hash(rd.from_arrow(t).repartition(13))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a["split"].tolist() == b["split"].tolist()
    frac = (a["split"] == "train").mean()
    assert 0.95 < frac < 0.99  # ~0.98 by construction


def test_split_by_hash_partition_is_exhaustive_and_disjoint():
    t = _docs(500)
    out = split_by_hash(
        rd.from_arrow(t), splits={"train": 0.5, "val": 0.25}
    ).to_pandas()
    assert set(out["split"]) <= {"train", "val", "rest"}
    assert len(out) == 500  # every row gets exactly one split


def test_sample_by_hash_is_subset_and_stable():
    t = _docs()
    s1 = set(sample_by_hash(rd.from_arrow(t).repartition(3), 0.2)
             .to_pandas()["doc_id"])
    s2 = set(sample_by_hash(rd.from_arrow(t).repartition(7), 0.2)
             .to_pandas()["doc_id"])
    assert s1 == s2
    assert 0.15 < len(s1) / 2000 < 0.25
    # sampling commutes with growing the corpus: old rows keep their fate
    bigger = _docs(3000)
    s3 = set(sample_by_hash(rd.from_arrow(bigger), 0.2).to_pandas()["doc_id"])
    assert s1 == {d for d in s3 if d < "doc-002000"}


def test_reservoir_top_hash_matches_global_answer():
    t = _docs(1000)
    got = reservoir_top_hash(rd.from_arrow(t).repartition(8), k=25)
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)
    h = _stable_hash64(ids)
    exp = ids[np.lexsort((ids, h))[:25]].tolist()
    assert got["doc_id"].tolist() == exp
    assert list(got.columns) == ["doc_id", "x"]


def test_two_level_shuffle_deterministic_permutation(ray_session):
    import ray.data as rd

    from log_formatter_ray.ops.sample import two_level_shuffle

    t = pa.table({
        "doc_id": pa.array(range(2000), pa.int64()),
        "v": pa.array([i * 3 % 17 for i in range(2000)], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(8)
    a = two_level_shuffle(ds, seed=42).to_pandas()
    b = two_level_shuffle(ds, seed=42).to_pandas()
    c = two_level_shuffle(ds, seed=7).to_pandas()
    orig = ds.to_pandas()
    # exactly the input rows (a permutation), deterministic per seed,
    # different across seeds, and actually shuffled
    assert sorted(a["doc_id"]) == sorted(orig["doc_id"])
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["doc_id"].tolist() != c["doc_id"].tolist()
    assert a["doc_id"].tolist() != orig["doc_id"].tolist()
    # rows stay intact (columns move together)
    assert dict(zip(a["doc_id"], a["v"])) == dict(zip(orig["doc_id"], orig["v"]))


def test_mixture_rates_logic():
    from log_formatter_ray.ops.sample import mixture_rates

    # binding source (the one that runs out first) keeps 100%
    r = mixture_rates({"a": 100, "b": 1000}, {"a": 0.5, "b": 0.5},
                      denom=1000)
    assert r["a"] == 1000 and r["b"] == 100
    # weight-0 and absent sources are dropped
    r = mixture_rates({"a": 10, "b": 10, "c": 10}, {"a": 1.0, "b": 0.0},
                      denom=1000)
    assert r == {"a": 1000}
    # weights renormalize
    assert mixture_rates({"a": 50, "b": 50}, {"a": 2.0, "b": 2.0},
                         denom=1000) == {"a": 1000, "b": 1000}
    assert mixture_rates({}, {"a": 1.0}) == {}


def test_sample_mixture_deterministic_and_proportional(ray_session):
    import ray.data as rd

    from log_formatter_ray.ops.sample import sample_mixture

    n = 30_000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(
            ["web" if i % 10 < 6 else ("code" if i % 10 < 9 else "books")
             for i in range(n)]),
    })
    weights = {"web": 0.5, "code": 0.3, "books": 0.2}
    a = sample_mixture(rd.from_arrow(t).repartition(4), weights).to_pandas()
    b = sample_mixture(rd.from_arrow(t).repartition(13), weights).to_pandas()
    # identical row set across parallelism levels
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    got = a.groupby("source").size()
    # books is binding (3000 docs / 0.2 share): kept fully
    assert got["books"] == 3000
    # others within binomial tolerance of their targets
    assert abs(got["web"] - 7500) < 300
    assert abs(got["code"] - 4500) < 250
    # no source leaks rows it shouldn't (dropped-source case)
    c = sample_mixture(
        rd.from_arrow(t), {"web": 1.0}
    ).to_pandas()
    assert set(c["source"]) == {"web"} and len(c) == 18000


def test_stratified_sample_matches_md5_oracle_and_is_layout_invariant():
    """Exact-k per-stratum sampling: selection = k smallest md5(id) per
    key — engine-neutral, so DuckDB's window-function form reproduces the
    identical row set; and a pure function of the row, so shard layout /
    parallelism cannot change it."""
    import duckdb
    import pyarrow as pa

    import ray.data as rd

    from log_formatter_ray.ops.sample import stratified_sample

    n = 500
    t = pa.table({
        "doc_id": pa.array([f"d{i:04d}" for i in range(n)], pa.string()),
        "lang": pa.array([["en", "de", "fr", "hot"][min(i % 10, 3)]
                          for i in range(n)], pa.string()),
        "v": pa.array(range(n), pa.int64()),
    })
    exp = duckdb.sql("""
        SELECT doc_id, lang, v FROM (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY md5(doc_id), doc_id) AS r FROM t
        ) WHERE r <= 7 ORDER BY doc_id
    """).df()

    for parts in (1, 5):
        got = (
            stratified_sample(rd.from_arrow(t).repartition(parts),
                              "lang", k=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), parts
        assert got["v"].tolist() == exp["v"].tolist()
    assert (got.groupby("lang").size() == 7).all()

    # k larger than a stratum keeps the whole stratum, exactly once
    tiny = pa.table({
        "doc_id": pa.array(["a", "b", "c"], pa.string()),
        "lang": pa.array(["x", "x", "y"], pa.string()),
    })
    all_rows = (
        stratified_sample(rd.from_arrow(tiny).repartition(2), "lang", k=10)
        .to_pandas().sort_values("doc_id")
    )
    assert all_rows["doc_id"].tolist() == ["a", "b", "c"]

    # column projection travels through the shuffle
    slim = stratified_sample(
        rd.from_arrow(t).repartition(3), "lang", k=2, columns=["lang"]
    ).to_pandas()
    assert set(slim.columns) == {"lang", "doc_id"}


def test_token_budget_sample_matches_duckdb_window_oracle():
    """Per-key md5-ordered prefix under a running-size budget equals the
    SQL window formulation, at any parallelism (combiner validity)."""
    import duckdb

    rng = np.random.default_rng(14)
    n = 400
    t = pa.table({
        "doc_id": pa.array([f"d{i:05d}" for i in range(n)]),
        "source": pa.array(rng.choice(["web", "code", "wiki"], n)),
        "n_tok": pa.array(rng.integers(1, 50, n).astype(np.int32)),
    })
    from log_formatter_ray.ops.sample import token_budget_sample

    con = duckdb.connect()
    con.register("seqs", t.to_pandas())
    want = con.execute("""
        SELECT doc_id, source, n_tok FROM (
          SELECT doc_id, source, n_tok,
                 SUM(CAST(n_tok AS BIGINT)) OVER (
                   PARTITION BY source ORDER BY md5(doc_id), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM seqs)
        WHERE c <= 300 ORDER BY doc_id
    """).df()
    for parts in (1, 7):
        got = (
            token_budget_sample(
                rd.from_arrow(t).repartition(parts), "source", 300
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        got["n_tok"] = got["n_tok"].astype(want["n_tok"].dtype)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_token_budget_sample_prefix_property():
    """Within each key, kept rows are exactly the maximal md5-order
    prefix whose cumulative size fits the budget."""
    t = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"]),
        "source": pa.array(["s", "s", "s", "s"]),
        "n_tok": pa.array([10, 10, 10, 10], pa.int32()),
    })
    from log_formatter_ray.ops.sample import token_budget_sample

    got = token_budget_sample(rd.from_arrow(t), "source", 25).to_pandas()
    assert len(got) == 2  # 10+10 fits, third row would exceed 25
    # budget below the smallest row -> empty, never a partial row
    empty = token_budget_sample(rd.from_arrow(t), "source", 5).to_pandas()
    assert len(empty) == 0
