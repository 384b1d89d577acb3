"""ANN: brute-force exact vs numpy oracle; IVF recall vs brute force."""

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from log_formatter_ray.ops.ann import IVFIndex, brute_force_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(EMB)


def _numpy_oracle_topk(table, q, k, exclude=()):
    V = np.stack(table["embedding"].to_pandas().to_numpy()).astype(np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = V @ qn
    ids = np.asarray(table["vec_id"])
    order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))
    order = [i for i in order if ids[i] not in exclude]
    return [int(ids[i]) for i in order[:k]]


def test_brute_force_matches_numpy_oracle(emb_table):
    q = np.asarray(emb_table["embedding"][0].as_py(), dtype=np.float64)
    ds = rd.from_arrow(emb_table).repartition(5)
    got = brute_force_topk(ds, q, k=10, concurrency=2)
    assert got["vec_id"].tolist() == _numpy_oracle_topk(emb_table, q, 10)
    assert got["rank"].tolist() == list(range(1, 11))
    assert got["cos"].iloc[0] == pytest.approx(1.0)  # query is row 0 itself


def test_brute_force_exclude_self(emb_table):
    q = np.asarray(emb_table["embedding"][0].as_py(), dtype=np.float64)
    ds = rd.from_arrow(emb_table)
    got = brute_force_topk(ds, q, k=5, exclude_ids={0}, concurrency=2)
    assert 0 not in got["vec_id"].tolist()
    assert got["vec_id"].tolist() == _numpy_oracle_topk(emb_table, q, 5, exclude={0})


def test_ivf_recall(emb_table):
    ds = rd.from_arrow(emb_table)
    idx = IVFIndex(n_clusters=8, iters=5).fit(ds)
    assigned = idx.assign(ds).materialize()
    q = np.asarray(emb_table["embedding"][3].as_py(), dtype=np.float64)
    exact = set(_numpy_oracle_topk(emb_table, q, 10))
    got = idx.search(assigned, q, k=10, nprobe=4)
    recall = len(exact & set(got["vec_id"].tolist())) / 10
    assert recall >= 0.5  # nprobe=4 of 8 clusters
    full = idx.search(assigned, q, k=10, nprobe=8)  # probing all = exact
    assert set(full["vec_id"].tolist()) == exact


def test_ivf_fit_unbiased_on_cluster_sorted_corpus():
    """fit() samples via the deterministic hash reservoir, so a corpus laid
    out BY CLUSTER (worst case for the old ``limit()`` first-blocks sample,
    which only ever saw cluster 0) trains the same-quality centroids as the
    shuffled layout: recall on the sorted layout must match the unsorted
    one."""
    rng = np.random.default_rng(5)
    n_per, n_clusters, dim = 800, 6, 16
    centers = rng.standard_normal((n_clusters, dim)) * 4
    V = np.concatenate(
        [centers[c] + rng.standard_normal((n_per, dim)) for c in range(n_clusters)]
    ).astype(np.float32)
    true_cluster = np.repeat(np.arange(n_clusters), n_per)
    ids = np.arange(len(V), dtype=np.int64)

    import pyarrow as pa

    def make_ds(order):
        t = pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V[order].reshape(-1)), dim
                ),
            }
        )
        return rd.from_arrow(t).repartition(12)

    q = centers[4] + rng.standard_normal(dim) * 0.1

    def recall(ds):
        idx = IVFIndex(n_clusters=n_clusters, iters=5).fit(ds, sample_rows=600)
        assigned = idx.assign(ds).materialize()
        got = set(idx.search(assigned, q, k=10, nprobe=2)["vec_id"].tolist())
        exact = set(
            brute_force_topk(ds, q, k=10, concurrency=2)["vec_id"].tolist()
        )
        return len(got & exact) / 10

    sorted_order = np.argsort(true_cluster, kind="stable")
    shuffled_order = rng.permutation(len(V))
    r_sorted = recall(make_ds(sorted_order))
    r_shuffled = recall(make_ds(shuffled_order))
    # the hash reservoir is layout-independent → identical sample → the
    # sorted layout cannot do worse than the shuffled one
    assert r_sorted >= r_shuffled
    assert r_sorted >= 0.9


def test_quantize_embeddings_roundtrip(emb_table):
    from log_formatter_ray.ops.ann import dequantize, quantize_embeddings

    out = quantize_embeddings(emb_table.slice(0, 50))
    V = np.stack(emb_table.slice(0, 50)["embedding"].to_pandas().to_numpy()).astype(np.float32)
    Q = np.asarray(out["embedding_q8"].combine_chunks().flatten()).reshape(50, -1)
    scale = np.asarray(out["q_scale"])
    D = dequantize(Q, scale)
    # per-component error bounded by scale/2
    err = np.abs(D - V)
    assert (err <= scale.reshape(-1, 1) / 2 + 1e-6).all()
    # quantized top-1 neighbor of a vector is usually itself after roundtrip
    assert np.abs(Q).max() <= 127


def test_ivf_partitioned_search_reads_only_probed_dirs(emb_table, tmp_path):
    """write_partitioned lays the corpus out hive-partitioned by cluster;
    search_partitioned must open ONLY the nprobe probed directories and,
    with nprobe = n_clusters, must equal the exact brute force."""
    import os

    ds = rd.from_arrow(emb_table).repartition(3)
    idx = IVFIndex(n_clusters=8, iters=4).fit(ds)
    root = str(tmp_path / "ivf")
    idx.write_partitioned(ds, root)
    dirs = sorted(d for d in os.listdir(root) if d.startswith("cluster="))
    assert 1 < len(dirs) <= 8

    q = np.asarray(emb_table["embedding"][3].as_py(), dtype=np.float64)
    probed = idx.probed_dirs(root, q, nprobe=2)
    assert len(probed) <= 2 and set(probed) < {os.path.join(root, d) for d in dirs}

    # full-probe search over the partitioned layout == exact brute force
    got = idx.search_partitioned(root, q, k=5, nprobe=8)
    exp = brute_force_topk(rd.from_arrow(emb_table), q, k=5)
    assert got["vec_id"].tolist() == exp["vec_id"].tolist()

    # narrow probe returns k hits from probed partitions only
    narrow = idx.search_partitioned(root, q, k=5, nprobe=2)
    assert len(narrow) == 5


def test_ivf_search_partitioned_all_probed_clusters_empty(tmp_path):
    """If every probed cluster directory is missing/empty, the search
    returns an empty typed frame instead of crashing."""
    idx = IVFIndex(n_clusters=4, iters=1)
    idx.centroids = np.eye(4, 8, dtype=np.float64)  # fitted-by-hand
    out = idx.search_partitioned(str(tmp_path / "nowhere"), np.ones(8), k=3)
    assert len(out) == 0
    assert list(out.columns) == ["query_idx", "vec_id", "cos", "rank"]
