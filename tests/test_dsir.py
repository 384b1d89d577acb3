"""DSIR importance weighting (ops/dsir.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from log_formatter_ray.ops.dsir import (
    _gram_buckets,
    fit_dsir,
    hashed_ngram_histogram,
    score_dsir,
)

B = 512


def _domain_corpus(seed=4, n_a=60, n_b=60):
    """Two disjoint-vocab domains: A (science-y) and B (sports-y)."""
    rng = np.random.default_rng(seed)
    vocab_a = [f"atom{i}" for i in range(20)]
    vocab_b = [f"goal{i}" for i in range(20)]
    rows = []
    for i in range(n_a):
        rows.append((i, " ".join(rng.choice(vocab_a, size=12)), "A"))
    for i in range(n_b):
        rows.append((n_a + i, " ".join(rng.choice(vocab_b, size=12)), "B"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "domain": pa.array([r[2] for r in rows], pa.string()),
    })


def test_gram_buckets_bigrams_never_cross_rows():
    t = pa.table({"text": pa.array(["a b c", "d e", "", "f"])})
    uni, w_off, big, valid = _gram_buckets(t["text"], B)
    assert np.diff(w_off).tolist() == [3, 2, 0, 1]
    # flat word stream a b c d e f -> pairs (ab)(bc)(cd)(de)(ef);
    # cd and ef cross row boundaries
    assert valid.tolist() == [True, True, False, True, False]


def test_histogram_is_exact_and_layout_invariant():
    t = _domain_corpus()
    h1 = hashed_ngram_histogram(rd.from_arrow(t), buckets=B)
    h4 = hashed_ngram_histogram(rd.from_arrow(t).repartition(7), buckets=B)
    assert np.array_equal(h1, h4)
    # total mass = total unigrams + intra-row bigrams
    n_words = 120 * 12
    assert h1.sum() == n_words + 120 * 11


def test_dsir_separates_planted_domains():
    t = _domain_corpus()
    ds = rd.from_arrow(t).repartition(4)
    target = ds.filter(
        expr="domain == 'A'"
    ).limit(30)  # small target sample from domain A
    lr = fit_dsir(target, ds, buckets=B)
    scored = score_dsir(ds, lr).to_pandas()
    a = scored.loc[scored["domain"] == "A", "dsir_logw"]
    b = scored.loc[scored["domain"] == "B", "dsir_logw"]
    assert a.min() > b.max()  # every A doc outranks every B doc


def test_dsir_scores_invariant_to_parallelism():
    t = _domain_corpus(seed=9)
    base = rd.from_arrow(t)
    lr = fit_dsir(base.filter(expr="domain == 'A'"), base, buckets=B)
    s1 = score_dsir(base, lr).to_pandas().sort_values("doc_id")
    s7 = (
        score_dsir(base.repartition(7), lr)
        .to_pandas().sort_values("doc_id")
    )
    # bit-identical: integer histograms + per-row reduceat
    assert s1["dsir_logw"].tolist() == s7["dsir_logw"].tolist()
