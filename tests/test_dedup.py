"""Dedup operators: exact (pandas oracle), MinHash-LSH, SimHash, Jaccard,
embedding near-dup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from log_formatter_ray.ops.dedup import (
    add_simhash,
    dedup_by_clusters,
    embedding_dup_pairs,
    exact_dedup,
    jaccard,
    minhash_lsh_clusters,
    ngram_set,
    simhash_candidates,
    verify_pairs_jaccard,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill in the afternoon sun and the birds sing in the trees"
)


@pytest.fixture()
def dup_table():
    texts, ids = [], []
    for i in range(40):
        if i % 10 == 0:
            texts.append(BASE)  # exact dups: ids 0,10,20,30
        elif i % 10 == 1:
            texts.append(BASE + f" extra tail {i}")  # near dups of BASE
        else:
            texts.append(f"totally unrelated document number {i} " + "filler words " * i)
        ids.append(i)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_exact_dedup_matches_pandas_oracle(dup_table):
    ds = rd.from_arrow(dup_table).repartition(4)
    got = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = (
        dup_table.to_pandas()
        .sort_values("doc_id")
        .groupby("text", as_index=False)
        .first()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], exp[["doc_id", "text"]])
    # the three duplicate copies of BASE are gone, keeper is min id (0)
    assert (got["text"] == BASE).sum() == 1
    assert 0 in got["doc_id"].tolist()


def test_minhash_lsh_finds_near_dups(dup_table):
    ds = rd.from_arrow(dup_table).repartition(3)
    clusters = minhash_lsh_clusters(ds, threshold=0.5, concurrency=2).to_pandas()
    # exact copies of BASE + near-dups must share a cluster with rep 0
    members = set(clusters.loc[clusters["rep"] == 0, "id"])
    assert {0, 10, 20, 30}.issubset(members | {0})
    assert {1, 11, 21, 31} & members  # at least some near-dups joined
    # unrelated docs never clustered with BASE
    assert not ({5, 17, 29} & members)
    deduped = dedup_by_clusters(ds, clusters).to_pandas()
    assert len(deduped) == len(dup_table) - (len(clusters) - clusters["rep"].nunique())


def test_simhash_and_jaccard_pipeline(dup_table):
    ds = rd.from_arrow(dup_table).map_batches(add_simhash, batch_format="pyarrow")
    cands = simhash_candidates(ds).to_pandas()
    pairs = set(map(tuple, cands[["a", "b"]].to_numpy()))
    assert (0, 10) in pairs  # identical docs always candidates
    verified = verify_pairs_jaccard(ds, cands, threshold=0.9).to_pandas()
    vpairs = set(map(tuple, verified[["a", "b"]].to_numpy()))
    assert (0, 10) in vpairs and (10, 20) in vpairs


def test_ngram_jaccard_helpers():
    a = ngram_set("a b c d", 2)
    assert a == {"a b", "b c", "c d"}
    assert jaccard(a, a) == 1.0
    assert jaccard(a, set()) == 0.0
    assert jaccard(set(), set()) == 1.0


def test_embedding_dup_pairs():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((60, 16)).astype(np.float32)
    V[7] = V[3] * 2.0  # same direction → cosine 1.0
    V[25] = V[11] + rng.standard_normal(16).astype(np.float32) * 1e-3
    t = pa.table(
        {
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), pa.float32()), 16
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    pairs = embedding_dup_pairs(ds, threshold=0.99, nbits=4).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    # identical-direction vectors always land in the same hyperplane bucket
    assert (3, 7) in got
    assert (11, 25) in got
    for a, b, c in pairs.itertuples(index=False):
        assert c >= 0.99


def test_exact_dedup_no_chimera_rows():
    # the keeper must be the WHOLE min-id row — a null field on the keeper
    # must NOT be backfilled from a dropped duplicate (pandas .first() trap)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["same", "same"],
            "lang": [None, "en"],
        }
    )
    got = exact_dedup(rd.from_arrow(t)).to_pandas()
    assert len(got) == 1
    assert got["doc_id"].iloc[0] == 1
    assert got["lang"].iloc[0] is None  # keeper's own null, not the dup's "en"


def test_dedup_by_clusters_empty_is_noop():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["a", "b"]})
    ds = rd.from_arrow(t)
    empty = pd.DataFrame({"id": [], "rep": []})
    assert dedup_by_clusters(ds, empty).count() == 2


@pytest.mark.parametrize("with_tokens", [False, True])
def test_dedup_by_clusters_partitioned_matches_broadcast(with_tokens):
    """The hash-partitioned anti-join plan (forced by broadcast_limit=0)
    must keep exactly the rows the broadcast plan keeps — including a
    list<int32> tokens payload, which must survive the pyarrow-format
    shuffle byte-exactly."""
    n = 500
    ids = [f"doc-{i:04d}" for i in range(n)]
    cols = {
        "doc_id": pa.array(ids),
        "text": pa.array([f"text {i}" for i in range(n)]),
    }
    rng = np.random.default_rng(5)
    if with_tokens:
        toks = [rng.integers(0, 2**31 - 1, size=rng.integers(1, 9)).astype(np.int32)
                for _ in range(n)]
        cols["tokens"] = pa.array([t.tolist() for t in toks], pa.list_(pa.int32()))
    ds = rd.from_arrow(pa.table(cols)).repartition(8)
    # every 5th doc is a dup of the preceding rep
    clusters = pd.DataFrame(
        {
            "id": [ids[i] for i in range(0, n, 5)],
            "rep": [ids[i - (i % 10)] for i in range(0, n, 5)],
        }
    )
    kept_b = (
        dedup_by_clusters(ds, clusters, mode="broadcast")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    kept_p = (
        dedup_by_clusters(ds, clusters, mode="partitioned", coarse=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(kept_b.columns) == list(kept_p.columns)
    pd.testing.assert_frame_equal(kept_b, kept_p)
    # auto above the (forced-zero) limit picks the partitioned plan
    kept_auto = (
        dedup_by_clusters(ds, clusters, mode="auto", broadcast_limit=0, coarse=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(kept_b, kept_auto)
    # Dataset-typed clusters exercise the distributed drop-set path
    kept_ds = (
        dedup_by_clusters(ds, rd.from_pandas(clusters), mode="partitioned",
                          coarse=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(kept_b, kept_ds)
    if with_tokens:
        # byte-exact list payload after the shuffle
        orig = {i: t for i, t in zip(ids, (c.tolist() for c in toks))}
        for _, row in kept_p.iterrows():
            assert list(row["tokens"]) == orig[row["doc_id"]]


def test_minhash_distributed_cc_matches_local(dup_table):
    """The iterative min-label-propagation CC plan must produce the exact
    same clusters as the single-worker contraction plan."""
    ds = rd.from_arrow(dup_table).repartition(3)
    local = (
        minhash_lsh_clusters(ds, threshold=0.5, cc_mode="local")
        .to_pandas().reset_index(drop=True)
    )
    dist = (
        minhash_lsh_clusters(ds, threshold=0.5, cc_mode="distributed")
        .to_pandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        local.astype({"id": "int64", "rep": "int64"}),
        dist.astype({"id": "int64", "rep": "int64"}),
    )


def test_connected_components_chain_and_modes():
    """A path graph exercises multi-round label propagation (diameter > 1)."""
    from log_formatter_ray.ops.graph import connected_components

    edges = pd.DataFrame(
        {"a": [1, 2, 3, 10, 20], "b": [2, 3, 4, 11, 21]}
    )
    exp = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    for mode in ("local", "distributed"):
        got = connected_components(rd.from_pandas(edges), mode=mode).to_pandas()
        assert dict(zip(got["id"], got["rep"])) == exp, mode


def test_simhash_bucket_cap_truncates(caplog):
    """A degenerate all-identical corpus must stay under the bucket cap
    (bounded O(max_bucket^2) pairing) and log the truncation."""
    import logging

    n = 30
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["identical content here"] * n),
        }
    )
    ds = rd.from_arrow(t).map_batches(add_simhash, batch_format="pyarrow")
    with caplog.at_level(logging.WARNING, logger="log_formatter_ray"):
        pairs = simhash_candidates(ds, max_bucket=10).to_pandas()
    # pairs bounded by the cap: C(10,2) per band, deduped across bands
    assert 0 < len(pairs) <= 45


def test_embedding_dup_bucket_cap():
    rng = np.random.default_rng(1)
    V = np.tile(rng.standard_normal(8).astype(np.float32), (25, 1))
    t = pa.table(
        {
            "vec_id": pa.array(range(25), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), pa.float32()), 8
            ),
        }
    )
    ds = rd.from_arrow(t)
    pairs = embedding_dup_pairs(ds, threshold=0.99, nbits=4, max_bucket=5).to_pandas()
    assert 0 < len(pairs) <= 10  # C(5,2) per band, 2 bands


def test_minhash_degenerate_identical_corpus_bounded():
    """All-identical docs: every band bucket is the whole corpus — the
    max_bucket cap must keep pairing O(cap^2), and the cluster must still
    be found (one cluster containing at least the capped members)."""
    n = 60
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["all documents carry the same words here"] * n),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    clusters = minhash_lsh_clusters(ds, threshold=0.5, max_bucket=10).to_pandas()
    # identical docs => estimated jaccard 1.0 for every surviving pair;
    # the cap bounds work, not correctness of what IS emitted
    assert clusters["rep"].nunique() == 1
    assert (clusters["rep"] == 0).all()
    assert 2 <= len(clusters) <= n


def test_connected_components_random_graph_parity():
    """2000 random edges over 1500 nodes: the coarse-partitioned
    distributed plan must agree exactly with the single-worker union-find
    (multi-partition, multi-round propagation on a non-trivial graph)."""
    from log_formatter_ray.ops.graph import connected_components

    rng = np.random.default_rng(11)
    a = rng.integers(0, 1500, 2000)
    b = rng.integers(0, 1500, 2000)
    m = a != b
    edges = pd.DataFrame({"a": a[m], "b": b[m]})
    ds = rd.from_pandas(edges).repartition(4)
    loc = connected_components(ds, mode="local").to_pandas()
    dist = connected_components(ds, mode="distributed", coarse=64).to_pandas()
    lmap = dict(zip(loc["id"].astype(int), loc["rep"].astype(int)))
    dmap = dict(zip(dist["id"].astype(int), dist["rep"].astype(int)))
    assert lmap == dmap


def test_connected_components_huge_int_ids_exact():
    """Node ids above 2^53 must survive the distributed rounds exactly
    (a float64 round-trip would silently merge adjacent ids)."""
    from log_formatter_ray.ops.graph import connected_components

    base = 2**62
    edges = pd.DataFrame(
        {"a": [base + 1, base + 2, base + 5],
         "b": [base + 2, base + 3, base + 6]}
    )
    for mode in ("local", "distributed"):
        got = connected_components(rd.from_pandas(edges), mode=mode).to_pandas()
        m = dict(zip(got["id"].astype(np.uint64), got["rep"].astype(np.uint64)))
        assert m == {
            base + 1: base + 1, base + 2: base + 1, base + 3: base + 1,
            base + 5: base + 5, base + 6: base + 5,
        }, mode


def test_verify_pairs_jaccard_string_ids():
    """String doc ids take the nulls-dummy path through the incidence
    build and the object-dtype hash partitioning."""
    t = pa.table(
        {
            "doc_id": pa.array(["d/one", "d/two", "d/three"]),
            "text": ["alpha beta gamma delta"] * 2
            + ["completely different words here"],
        }
    )
    ds = rd.from_arrow(t)
    pairs = pd.DataFrame(
        {"a": ["d/one", "d/one"], "b": ["d/two", "d/three"]}
    )
    for mode in ("local", "distributed"):
        out = verify_pairs_jaccard(
            ds, pairs, threshold=0.9, mode=mode
        ).to_pandas()
        assert out["a"].tolist() == ["d/one"], mode
        assert out["b"].tolist() == ["d/two"], mode
        assert out["jaccard"].tolist() == [1.0], mode


def test_connected_components_nonconvergence_raises_by_default():
    """Distributed CC labels feed a dedup that DELETES documents, so an
    unconverged result must raise (strict default), not return wrong
    labels with only a warning; strict=False keeps the best-effort path."""
    import pytest

    from log_formatter_ray.ops.graph import connected_components

    chain = pd.DataFrame({"a": list(range(0, 12)), "b": list(range(1, 13))})
    ds = rd.from_pandas(chain)
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(
            ds, mode="distributed", max_iters=2, coarse=8
        ).to_pandas()
    out = connected_components(
        ds, mode="distributed", max_iters=2, coarse=8, strict=False
    ).to_pandas()
    assert len(out) == 13  # best-effort labels still cover every node


def test_verify_pairs_jaccard_huge_int_ids_and_dup_pairs():
    base = 2**62
    t = pa.table(
        {
            "doc_id": pa.array([base + 1, base + 2, base + 3], pa.int64()),
            "text": ["alpha beta gamma delta"] * 2 + ["totally different words here"],
        }
    )
    ds = rd.from_arrow(t)
    pairs = pd.DataFrame(
        {"a": [base + 1, base + 1, base + 1],
         "b": [base + 2, base + 2, base + 3]}  # duplicate pair included
    )
    for mode in ("local", "distributed"):
        out = verify_pairs_jaccard(
            ds, pairs, threshold=0.9, mode=mode
        ).to_pandas()
        assert out["a"].tolist() == [base + 1], mode
        assert out["b"].tolist() == [base + 2], mode
        assert out["a"].dtype == "int64", mode  # 2^62 ids survive


def test_exact_dedup_light_matches_safe(dup_table):
    """mode='light' (payload never shuffles, 128-bit identity) must keep
    exactly the rows the collision-safe plan keeps — including null texts
    and the forced partitioned-anti-join path."""
    import pyarrow as pa

    t = dup_table.append_column(
        "extra", pa.array([f"x{i}" for i in range(len(dup_table))])
    )
    # add null-text rows (dedupe to one kept row, SQL GROUP BY semantics)
    nulls = pa.table(
        {
            "doc_id": pa.array([100, 101], pa.int64()),
            "text": pa.nulls(2, pa.string()),
            "extra": pa.array(["nx0", "nx1"]),
        }
    )
    full = pa.concat_tables([t, nulls])
    ds = rd.from_arrow(full).repartition(5)
    safe = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    light = (
        exact_dedup(ds, mode="light")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        safe[["doc_id", "text", "extra"]], light[["doc_id", "text", "extra"]]
    )
    forced = (
        exact_dedup(ds, mode="light", broadcast_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        safe[["doc_id", "text", "extra"]], forced[["doc_id", "text", "extra"]]
    )


def test_minhash_light_shuffle_matches_default(dup_table):
    """shuffle_mode='light' (24-byte key rows + candidate-only sig pass)
    must produce the identical cluster map."""
    ds = rd.from_arrow(dup_table).repartition(3)
    base = (
        minhash_lsh_clusters(ds, threshold=0.5, coarse=16)
        .to_pandas().reset_index(drop=True)
    )
    light = (
        minhash_lsh_clusters(ds, threshold=0.5, coarse=16,
                             shuffle_mode="light")
        .to_pandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, light)

    # broadcast_limit=0 forces the partitioned-semi-join pass-B filter
    # (the at-scale path for candidate sets too big to broadcast) —
    # identical cluster map required (ADVICE r4)
    forced = (
        minhash_lsh_clusters(ds, threshold=0.5, coarse=16,
                             shuffle_mode="light", broadcast_limit=0)
        .to_pandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, forced)

    # all-unique corpus: no candidates, empty cluster map
    uniq = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(
                [f"completely distinct document {i} " + " ".join(
                    f"u{i}x{j}" for j in range(12)) for i in range(20)]
            ),
        }
    )
    empty = minhash_lsh_clusters(
        rd.from_arrow(uniq).repartition(2), threshold=0.5, coarse=8,
        shuffle_mode="light",
    ).to_pandas()
    assert len(empty) == 0


def test_embedding_dup_light_shuffle_matches_default():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((80, 16)).astype(np.float32)
    V[7] = V[3] * 2.0
    V[25] = V[11] + rng.standard_normal(16).astype(np.float32) * 1e-3
    t = pa.table(
        {
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.reshape(-1), pa.float32()), 16
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    base = (
        embedding_dup_pairs(ds, threshold=0.99, nbits=4)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    light = (
        embedding_dup_pairs(ds, threshold=0.99, nbits=4, shuffle_mode="light")
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, light)
    assert {(3, 7), (11, 25)} <= set(map(tuple, light[["a", "b"]].to_numpy()))

    forced = (
        embedding_dup_pairs(ds, threshold=0.99, nbits=4,
                            shuffle_mode="light", broadcast_limit=0)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, forced)


def test_elect_cluster_reps_quality_argmax():
    """Quality re-election: each cluster's rep becomes its argmax-score
    member (ties → min id; unscored members rank last), so
    dedup_by_clusters then keeps the BEST duplicate instead of the
    min-id one."""
    from log_formatter_ray.ops.dedup import dedup_by_clusters, elect_cluster_reps

    clusters = pa.table({
        "id": pa.array([1, 2, 3, 10, 11, 20, 21], pa.int64()),
        "rep": pa.array([1, 1, 1, 10, 10, 20, 20], pa.int64()),
    })
    # cluster 1: argmax is 3; cluster 10: tie 0.5 → min id 10;
    # cluster 20: 21 unscored → 20 wins despite low score
    scores = pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
        "q": pa.array([0.1, 0.5, 0.9, 0.5, 0.5, 0.01], pa.float64()),
    })
    for parts in (1, 4):
        got = (
            elect_cluster_reps(
                rd.from_arrow(clusters).repartition(parts),
                rd.from_arrow(scores).repartition(parts),
                score_col="q",
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert got["id"].tolist() == [1, 2, 3, 10, 11, 20, 21]
        assert got["rep"].tolist() == [3, 3, 3, 10, 10, 20, 20], parts

    # forced-partitioned pass-A filter must elect identically
    forced = (
        elect_cluster_reps(
            rd.from_arrow(clusters).repartition(2),
            rd.from_arrow(scores).repartition(2),
            score_col="q", broadcast_limit=0,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert forced["rep"].tolist() == [3, 3, 3, 10, 10, 20, 20]

    # end-to-end: dedup keeps exactly the elected reps + unclustered rows
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11, 20, 21, 99], pa.int64()),
        "text": pa.array([f"t{i}" for i in [1, 2, 3, 10, 11, 20, 21, 99]]),
    })
    new_map = elect_cluster_reps(
        rd.from_arrow(clusters), rd.from_arrow(scores), score_col="q"
    )
    kept = (
        dedup_by_clusters(rd.from_arrow(corpus), new_map)
        .to_pandas()["doc_id"].sort_values().tolist()
    )
    assert kept == [3, 10, 20, 99]


def test_minhash_over_token_sequences():
    """MinHasher auto-detects a list<int> column and shingles over token
    ids — near-dup token sequences cluster without any text round-trip;
    signature identity matches between whole and sliced batches."""
    from log_formatter_ray.ops.dedup import MinHasher

    rng = np.random.default_rng(11)
    base = rng.integers(0, 50_000, size=120).astype(np.int32).tolist()
    rows = []
    for i in range(30):
        if i < 3:  # exact copies
            rows.append({"doc_id": i, "tokens": list(base)})
        elif i < 6:  # near dups: one token changed
            t = list(base)
            t[60] = int(t[60]) + 1
            rows.append({"doc_id": i, "tokens": t})
        else:
            rows.append({
                "doc_id": i,
                "tokens": rng.integers(0, 50_000, size=120).astype(
                    np.int32).tolist(),
            })
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.int32())),
    })
    ds = rd.from_arrow(t).repartition(3)
    clusters = minhash_lsh_clusters(
        ds, text_col="tokens", threshold=0.5, coarse=16
    ).to_pandas()
    members = set(clusters.loc[clusters["rep"] == 0, "id"])
    assert {0, 1, 2}.issubset(members | {0})   # exact copies cluster
    assert {3, 4, 5} & (members | set())       # near dups join
    assert not ({10, 20, 29} & members)        # unrelated never join

    # signature parity: sliced batch == same rows standalone
    mh = MinHasher(text_col="tokens")
    whole = mh(t)["sig"].to_pylist()
    part = mh(t.slice(2, 5))["sig"].to_pylist()
    assert part == whole[2:7]


def test_dup_overlap_matrix_matches_self_join_oracle():
    """Pair counts per unordered source pair equal the SQL self-join, at
    any parallelism; unique texts contribute nothing."""
    import duckdb

    from log_formatter_ray.ops.dedup import dup_overlap_matrix

    rng = np.random.default_rng(23)
    texts = [f"t{rng.integers(0, 60)}" for _ in range(300)]
    srcs = [str(s) for s in rng.choice(["web", "wiki", "code"], 300)]
    t = pa.table({
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(srcs, pa.string()),
    })
    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    want = con.execute("""
        SELECT least(a.source, b.source) AS src_a,
               greatest(a.source, b.source) AS src_b,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM docs a JOIN docs b ON a.text = b.text AND a.doc_id < b.doc_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    for parts in (1, 5):
        got = (
            dup_overlap_matrix(rd.from_arrow(t).repartition(parts),
                               coarse=11)
            .to_pandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
