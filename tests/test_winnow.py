"""Winnowing span fingerprints: selection guarantee, density, per-row
distinct correctness, and the distributed span_dup_pairs pipeline."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from log_formatter_ray.ops.winnow import (
    add_winnow_fingerprints,
    span_dup_pairs,
    winnow_select,
)


def _brute_winnow(grams: list[int], w: int) -> set[int]:
    if not grams:
        return set()
    if len(grams) < w:
        return {min(grams)}
    return {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}


def test_winnow_select_matches_bruteforce():
    rng = np.random.default_rng(2)
    rows = [list(rng.integers(0, 2**60, size=rng.integers(0, 40)))
            for _ in range(60)]
    flat = np.array([g for r in rows for g in r], np.uint64)
    off = np.zeros(len(rows) + 1, np.int64)
    np.cumsum([len(r) for r in rows], out=off[1:])
    for w in (1, 3, 7):
        sel, soff = winnow_select(flat, off, w)
        for i, r in enumerate(rows):
            got = set(sel[soff[i] : soff[i + 1]].tolist())
            assert got == _brute_winnow(r, w), (i, w)


def test_shared_span_guarantee_and_density():
    """Any shared span of >= w+k-1 words yields >= 1 shared fingerprint
    (the paper's guarantee), and selection density is ~2/(w+1)."""
    rng = np.random.default_rng(5)
    k, w = 5, 4  # guarantee threshold t = 8 words
    span = " ".join(f"shared{i}" for i in range(k + w - 1))
    docs = []
    for i in range(30):
        left = " ".join(rng.choice([f"w{j}" for j in range(5000)], 40))
        right = " ".join(rng.choice([f"w{j}" for j in range(5000)], 40))
        docs.append(f"{left} {span} {right}" if i % 3 == 0 else f"{left} {right}")
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    out = add_winnow_fingerprints(t, k=k, w=w)
    df = out.to_pandas()
    with_span = [i for i in range(len(docs)) if i % 3 == 0]
    fp_sets = {i: set(df.loc[df["doc_id"] == i, "fp"]) for i in range(len(docs))}
    # every pair of span-carrying docs shares >= 1 fingerprint
    for i in with_span:
        for j in with_span:
            if i < j:
                assert fp_sets[i] & fp_sets[j], (i, j)
    # density: selected fingerprints ~ 2/(w+1) of gram count (loose x2 band)
    n_words = 80 + (k + w - 1)
    grams_per_doc = n_words - k + 1
    mean_sel = np.mean([len(fp_sets[i]) for i in range(len(docs))])
    assert mean_sel <= 2.2 * grams_per_doc * 2 / (w + 1)


def test_span_dup_pairs_distributed_recovers_planted():
    rng = np.random.default_rng(7)
    span = " ".join(f"quote{i}" for i in range(20))  # 20-word shared block
    docs, ids = [], []
    for i in range(200):
        body = " ".join(rng.choice([f"v{j}" for j in range(20000)], 60))
        if i in (10, 110, 150):
            body = body[: len(body) // 2] + " " + span + " " + body[len(body) // 2 :]
        docs.append(body)
        ids.append(i)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(docs)})
    ).repartition(6)
    got = span_dup_pairs(ds, k=5, w=4, min_shared=2, coarse=32).to_pandas()
    pairs = set(map(tuple, got[["a", "b"]].to_numpy()))
    assert {(10, 110), (10, 150), (110, 150)} <= pairs
    # random-body docs don't pair (no shared spans)
    assert len(pairs) <= 6  # allow rare hash coincidences, not a flood
