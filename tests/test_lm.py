"""Unigram LM scoring: smoothing math vs a hand oracle, OOV/empty
handling, distributed-vs-local parity, min_count/max_vocab bounds."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from log_formatter_ray.ops.lm import (
    add_unigram_logprob,
    build_unigram_lm,
    score_corpus_unigram,
)

CORPUS = ["a a b", "a b c", "b"]  # counts: a×3, b×3, c×1 (total 7)


@pytest.fixture(scope="module")
def ds():
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    ).repartition(2)


def test_build_unigram_lm_smoothing_math(ds):
    vocab, logp, oov = build_unigram_lm(ds)
    assert vocab.tolist() == ["a", "b", "c"]
    denom = 7 + 3 + 1  # total + |vocab| + OOV bucket
    assert np.allclose(logp, np.log2(np.array([4, 4, 2]) / denom))
    assert math.isclose(oov, math.log2(1 / denom))


def test_unigram_scores_hand_oracle(ds):
    vocab, logp, oov = build_unigram_lm(ds)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b", "zzz", "", None], pa.string()),
    })
    out = add_unigram_logprob(t, vocab, logp, oov).to_pandas()
    denom = 11
    exp0 = (math.log2(4 / denom) + math.log2(4 / denom)) / 2
    assert math.isclose(out["logprob_mean"][0], exp0)
    assert math.isclose(out["ppl"][0], 2 ** -exp0)
    assert math.isclose(out["logprob_mean"][1], oov)  # pure OOV doc
    # empty/null text → one empty "word", which is OOV
    assert math.isclose(out["logprob_mean"][2], oov)
    assert math.isclose(out["logprob_mean"][3], oov)
    assert out["n_words"].tolist() == [2, 1, 1, 1]


def test_score_corpus_distributed_matches_local(ds):
    got = (
        score_corpus_unigram(ds, concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    vocab, logp, oov = build_unigram_lm(ds)
    t = pa.table({
        "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
        "text": pa.array(CORPUS, pa.string()),
    })
    exp = add_unigram_logprob(t, vocab, logp, oov).to_pandas()
    assert got["logprob_mean"].tolist() == exp["logprob_mean"].tolist()
    assert got["ppl"].tolist() == exp["ppl"].tolist()
    # more-probable docs rank higher: "a a b" (frequent only) vs doc with c
    assert got["logprob_mean"][0] > got["logprob_mean"][1]


def test_min_count_and_max_vocab_floor_the_collect(ds):
    vocab, logp, oov = build_unigram_lm(ds, min_count=2)
    assert vocab.tolist() == ["a", "b"]  # c (count 1) floored out
    vocab2, logp2, _ = build_unigram_lm(ds, max_vocab=1)
    assert vocab2.tolist() == ["a"] or vocab2.tolist() == ["b"]  # count tie
    assert len(logp2) == 1
