"""SemDeDup semantic dedup (ops/semdedup.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from log_formatter_ray.ops.ann import IVFIndex, _normalize
from log_formatter_ray.ops.semdedup import semdedup_clusters


def _corpus(n_groups=5, copies=3, n_noise=40, dim=16, seed=7):
    """Planted near-identical groups + random singletons."""
    rng = np.random.default_rng(seed)
    vecs, gids = [], []
    vid = 0
    for g in range(n_groups):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(copies):
            v = base + rng.normal(scale=1e-3, size=dim)
            vecs.append(v)
            gids.append((vid, g))
            vid += 1
    for _ in range(n_noise):
        vecs.append(rng.normal(size=dim))
        gids.append((vid, -1))
        vid += 1
    t = pa.table({
        "vec_id": pa.array([i for i, _ in gids], pa.int64()),
        "embedding": pa.array(
            [np.asarray(v, np.float32).tolist() for v in vecs],
            pa.list_(pa.float32()),
        ),
    })
    return t, gids


def _brute_expected(t, n_clusters, threshold, **fit_kw):
    """Driver-side oracle: same centroids, all-pairs within cluster."""
    ds = rd.from_arrow(t)
    idx = IVFIndex(n_clusters=n_clusters, **fit_kw).fit(ds)
    V = _normalize(np.stack(
        t["embedding"].combine_chunks().to_numpy(zero_copy_only=False)
    ).astype(np.float64))
    ids = t["vec_id"].to_numpy()
    cl = (V @ idx.centroids.T).argmax(axis=1)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in np.unique(cl):
        sel = np.flatnonzero(cl == c)
        S = V[sel] @ V[sel].T
        for i in range(len(sel)):
            for j in range(i + 1, len(sel)):
                if S[i, j] >= threshold:
                    a, b = find(int(ids[sel[i]])), find(int(ids[sel[j]]))
                    if a != b:
                        parent[max(a, b)] = min(a, b)
    comps = {}
    for i in ids:
        comps.setdefault(find(int(i)), []).append(int(i))
    out = {}
    for members in comps.values():
        if len(members) >= 2:
            r = min(members)
            for m in members:
                out[m] = r
    return out


def test_semdedup_recovers_planted_groups():
    t, gids = _corpus()
    got = semdedup_clusters(
        rd.from_arrow(t).repartition(4), n_clusters=4, threshold=0.95,
        coarse=8,
    ).to_pandas()
    mapping = dict(zip(got["id"], got["rep"]))
    # every planted group clusters to its min id
    for g in range(5):
        members = [i for i, gg in gids if gg == g]
        for m in members:
            assert mapping.get(m) == min(members), (g, m, mapping.get(m))


def test_semdedup_matches_brute_force_oracle():
    t, _ = _corpus(n_groups=4, copies=4, n_noise=60, seed=11)
    got = semdedup_clusters(
        rd.from_arrow(t).repartition(3), n_clusters=5, threshold=0.9,
        coarse=8,
    ).to_pandas()
    want = _brute_expected(t, n_clusters=5, threshold=0.9)
    assert dict(zip(got["id"], got["rep"])) == want
    assert got["id"].is_monotonic_increasing


def test_semdedup_invariant_to_parallelism_and_block():
    t, _ = _corpus(seed=13)
    runs = []
    for parts, block in ((1, 1024), (6, 3)):
        df = semdedup_clusters(
            rd.from_arrow(t).repartition(parts), n_clusters=4,
            threshold=0.95, coarse=5, block=block,
        ).to_pandas()
        runs.append(sorted(zip(df["id"], df["rep"])))
    assert runs[0] == runs[1]
    assert len(runs[0]) >= 10  # the planted groups are actually found


def test_semdedup_no_dups_is_empty():
    rng = np.random.default_rng(2)
    t = pa.table({
        "vec_id": pa.array(np.arange(30), pa.int64()),
        "embedding": pa.array(
            [rng.normal(size=32).astype(np.float32).tolist()
             for _ in range(30)],
            pa.list_(pa.float32()),
        ),
    })
    got = semdedup_clusters(
        rd.from_arrow(t), n_clusters=3, threshold=0.99
    ).to_pandas()
    assert len(got) == 0


def test_semdedup_partitioned_matches_shuffled(tmp_path):
    """The at-rest (zero-shuffle) plan equals the shuffled plan when both
    share one fitted index."""
    from log_formatter_ray.ops.semdedup import semdedup_clusters_partitioned

    t, _ = _corpus(seed=17)
    ds = rd.from_arrow(t)
    idx = IVFIndex(n_clusters=4, seed=42).fit(ds)
    base = semdedup_clusters(
        ds, n_clusters=4, threshold=0.95, coarse=8, index=idx
    ).to_pandas()
    layout = str(tmp_path / "ivf")
    idx.write_partitioned(ds, layout)
    part = semdedup_clusters_partitioned(
        layout, threshold=0.95
    ).to_pandas()
    assert sorted(zip(part["id"], part["rep"])) == sorted(
        zip(base["id"], base["rep"])
    )
    assert len(base) >= 10
