"""Incremental dedup against a persisted index (ops/incdedup.py)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from log_formatter_ray.ops.incdedup import (
    build_dedup_index,
    dedup_against_index,
    update_dedup_index,
)

IDX = "/tmp/lfr_test_incdedup_idx"


def _docs(ids, texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _fresh(path=IDX):
    shutil.rmtree(path, ignore_errors=True)
    return path


def test_incremental_dedup_wave_loop():
    """Wave 1 builds the index; wave 2 drops historical dups AND its own
    internal dups; wave 3 drops wave-2 survivors too (update applied)."""
    path = _fresh()
    corpus = _docs([1, 2, 3], ["alpha", "beta", "gamma"])
    build_dedup_index(corpus, path, parts=8)

    wave2 = _docs(
        [10, 11, 12, 13, 14],
        ["beta", "delta", "delta", "epsilon", "alpha"],
    ).repartition(3)
    kept2 = dedup_against_index(wave2, path, parts=8).to_pandas()
    assert sorted(kept2["text"]) == ["delta", "epsilon"]
    update_dedup_index(
        _docs(list(kept2["doc_id"]), list(kept2["text"])), path, parts=8
    )

    wave3 = _docs([20, 21, 22], ["delta", "zeta", "gamma"])
    kept3 = dedup_against_index(wave3, path, parts=8).to_pandas()
    assert sorted(kept3["text"]) == ["zeta"]


def test_incremental_dedup_matches_batch_exact_dedup():
    """index(A) then probe(B) keeps exactly B's texts not in A (modulo
    B-internal firsts) — cross-checked against a set-based oracle."""
    rng = np.random.default_rng(6)
    vocab = [f"t{i}" for i in range(40)]
    a_texts = [" ".join(rng.choice(vocab, 5)) for _ in range(150)]
    b_texts = [" ".join(rng.choice(vocab, 5)) for _ in range(150)]
    path = _fresh()
    build_dedup_index(
        _docs(list(range(150)), a_texts).repartition(4), path, parts=16
    )
    kept = dedup_against_index(
        _docs(list(range(1000, 1150)), b_texts).repartition(5), path,
        parts=16,
    ).to_pandas()
    a_set = set(a_texts)
    want = []
    seen = set()
    for t in b_texts:
        if t not in a_set and t not in seen:
            want.append(t)
            seen.add(t)
    assert sorted(kept["text"]) == sorted(want)


def test_index_layout_is_partition_pruned():
    """The index at rest is hive part= dirs of sorted 16-byte rows —
    a probe touches only its own directory."""
    path = _fresh()
    build_dedup_index(_docs([1, 2, 3, 4], ["a", "b", "c", "d"]), path,
                      parts=4)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("part="))
    assert dirs  # at least one populated partition
    t = pq.read_table(os.path.join(path, dirs[0]))
    assert set(t.column_names) >= {"h1", "h2"}
    h1 = t["h1"].to_numpy()
    assert np.all(np.diff(h1) >= 0)  # sorted within the partition


def test_within_false_keeps_internal_dups():
    path = _fresh()
    build_dedup_index(_docs([1], ["x"]), path, parts=4)
    wave = _docs([5, 6, 7], ["y", "y", "x"])
    kept = dedup_against_index(wave, path, parts=4, within=False)
    assert sorted(kept.to_pandas()["text"]) == ["y", "y"]


def test_within_keeper_is_min_id_when_id_col_given():
    path = _fresh()
    build_dedup_index(_docs([1], ["z"]), path, parts=4)
    wave = _docs([9, 5, 7], ["dup", "dup", "dup"]).repartition(3)
    kept = dedup_against_index(
        wave, path, parts=4, id_col="doc_id"
    ).to_pandas()
    assert kept["doc_id"].tolist() == [5]


def test_index_double_update_is_harmless():
    """A replayed (crash-retried) update appends the same identities
    twice; probes are membership tests, so duplicate index rows must
    change nothing."""
    path = _fresh()
    build_dedup_index(_docs([1], ["base"]), path, parts=4)
    wave = _docs([2, 3], ["new1", "new2"])
    kept = dedup_against_index(wave, path, parts=4).to_pandas()
    update_dedup_index(_docs(list(kept["doc_id"]), list(kept["text"])),
                       path, parts=4)
    update_dedup_index(_docs(list(kept["doc_id"]), list(kept["text"])),
                       path, parts=4)  # replay
    nxt = dedup_against_index(
        _docs([9, 10, 11], ["new1", "new2", "fresh"]), path, parts=4
    ).to_pandas()
    assert sorted(nxt["text"]) == ["fresh"]
