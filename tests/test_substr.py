"""Exact-substring (duplicated token span) removal (ops/substr.py)."""

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

import ray.data as rd

from log_formatter_ray.fixtures import make_spanful_sequences
from log_formatter_ray.ops.substr import exact_substr_dedup

L = 6


def _seqs(rows):
    """rows: list of (doc_id, tokens list)."""
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
    }))


def _by_id(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return {
        r["doc_id"]: (np.asarray(r["tokens"], np.int64), int(r["n_removed"]))
        for _, r in df.iterrows()
    }


def brute_exact_substr(ids, toks, gram_len):
    """Reference: rank every L-gram by (id, pos), cut rank>1 windows."""
    occ = {}
    for i, (d, t) in enumerate(zip(ids, toks)):
        for p in range(len(t) - gram_len + 1):
            occ.setdefault(tuple(t[p:p + gram_len]), []).append((d, p, i))
    cover = [np.zeros(len(t), bool) for t in toks]
    for lst in occ.values():
        lst.sort()
        for _, p, i in lst[1:]:
            cover[i][p:p + gram_len] = True
    return {d: np.asarray(t, np.int64)[~cover[i]]
            for i, (d, t) in enumerate(zip(ids, toks))}


def test_cross_doc_span_removed_winner_kept():
    span = list(range(100, 100 + L))
    a = [1, 2, 3] + span + [4, 5]
    b = [7, 8] + span + [9, 10, 11]
    out = _by_id(exact_substr_dedup(
        _seqs([("a", a), ("b", b)]).repartition(2), gram_len=L, coarse=4))
    assert np.array_equal(out["a"][0], a)          # winner byte-exact
    assert out["a"][1] == 0
    assert np.array_equal(out["b"][0], [7, 8, 9, 10, 11])
    assert out["b"][1] == L


def test_long_shared_span_cut_as_one_region():
    """A shared span of length M > L duplicates M-L+1 grams whose windows
    union to exactly [pos, pos+M) — the whole span goes, nothing else."""
    span = list(range(200, 200 + 3 * L))
    a = span + [1, 2]
    b = [5, 6, 7] + span + [8]
    out = _by_id(exact_substr_dedup(
        _seqs([("a", a), ("b", b)]), gram_len=L, coarse=4))
    assert np.array_equal(out["a"][0], a)
    assert np.array_equal(out["b"][0], [5, 6, 7, 8])
    assert out["b"][1] == 3 * L


def test_within_doc_repeat_second_occurrence_cut():
    span = list(range(300, 300 + L))
    a = span + [1, 2, 3] + span
    out = _by_id(exact_substr_dedup(_seqs([("a", a)]), gram_len=L, coarse=4))
    assert np.array_equal(out["a"][0], span + [1, 2, 3])
    assert out["a"][1] == L


def test_short_docs_and_uniques_pass_through_byte_exact():
    rows = [("a", [1, 2, 3]),                      # shorter than L
            ("b", list(range(50, 50 + L + 3)))]    # unique content
    out = _by_id(exact_substr_dedup(_seqs(rows), gram_len=L, coarse=4))
    for d, t in rows:
        got, nrem = out[d]
        assert np.array_equal(got, t) and nrem == 0


def test_planted_corpus_matches_brute_force():
    t = make_spanful_sequences(200, span_gram=L, seed=43)
    ids = t["doc_id"].to_pylist()
    toks = t["tokens"].to_pylist()
    expected = brute_exact_substr(ids, toks, L)
    out = _by_id(exact_substr_dedup(
        rd.from_arrow(t).repartition(5), gram_len=L, coarse=16))
    assert set(out) == set(expected)
    removed = 0
    for d in expected:
        assert np.array_equal(out[d][0], expected[d]), d
        removed += out[d][1]
    assert removed > 0  # the planting actually exercised the cut path


def test_partitioned_plan_matches_broadcast_and_block_layout_invariant():
    t = make_spanful_sequences(150, span_gram=L, seed=44)
    base = _by_id(exact_substr_dedup(
        rd.from_arrow(t).repartition(3), gram_len=L, coarse=8))
    part = _by_id(exact_substr_dedup(          # force the co-partition plan
        rd.from_arrow(t).repartition(3), gram_len=L, coarse=8,
        broadcast_limit=0))
    other = _by_id(exact_substr_dedup(         # different block layout
        rd.from_arrow(t).repartition(11), gram_len=L, coarse=32))
    for d in base:
        assert np.array_equal(base[d][0], part[d][0])
        assert base[d][1] == part[d][1]
        assert np.array_equal(base[d][0], other[d][0])
        assert base[d][1] == other[d][1]


def test_token_ngram_repetition_known_and_brute():
    from log_formatter_ray.ops.substr import token_ngram_repetition

    rows = [
        ("a", [1, 2, 3, 1, 2, 3, 1, 2]),   # 3-grams: 123,231,312,123,231,312
        ("b", [5, 5, 5, 5, 5]),            # all grams identical
        ("c", [1, 2]),                     # shorter than n
        ("d", [9, 8, 7, 6, 5, 4]),         # all distinct
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
    })
    out = token_ngram_repetition(t, n=3).to_pandas().set_index("doc_id")
    assert out.loc["a", "n_grams"] == 6 and out.loc["a", "n_dup"] == 3
    assert out.loc["b", "n_grams"] == 3 and out.loc["b", "n_dup"] == 2
    assert out.loc["c", "n_grams"] == 0 and out.loc["c", "n_dup"] == 0
    assert out.loc["d", "n_grams"] == 4 and out.loc["d", "n_dup"] == 0

    # brute-force parity on the planted corpus (within-doc plants give
    # real dup grams), sliced-batch safe
    corpus = make_spanful_sequences(120, span_gram=L, seed=46)
    got = token_ngram_repetition(corpus.slice(20, 80), n=3).to_pandas()
    for _, r in got.iterrows():
        i = int(r["doc_id"].split("-")[1])
        toks = corpus["tokens"][i].as_py()
        grams = [tuple(toks[p:p + 3]) for p in range(len(toks) - 2)]
        assert r["n_grams"] == len(grams)
        assert r["n_dup"] == len(grams) - len(set(grams))


# --- kernel property tests (pure per-batch functions; the e2e pipeline is
# pinned by the planted-corpus tests above) -------------------------------

_DOCS = st.lists(
    st.lists(st.integers(0, 3), min_size=0, max_size=25),  # tiny vocab ⇒
    min_size=1, max_size=8,                                # real gram repeats
)


def _table(docs):
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(docs))], pa.string()),
        "tokens": pa.array(docs, pa.list_(pa.int32())),
    })


@given(_DOCS, st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_gram_keys_partition_exactly_by_gram_equality(docs, n):
    """(h1, h2) groups the gram occurrences EXACTLY like the grams
    themselves — equal grams always collide, distinct grams never do (on
    this input size) — and positions are batch-layout-correct."""
    from log_formatter_ray.ops.substr import _gram_keys

    keys = _gram_keys(_table(docs), "tokens", "doc_id", n, 8).to_pandas()
    by_hash = {}
    for _, r in keys.iterrows():
        by_hash.setdefault((r["_h1"], r["_h2"]), set()).add(
            (r["doc_id"], r["_pos"]))
    by_gram = {}
    for i, t in enumerate(docs):
        for p in range(len(t) - n + 1):
            by_gram.setdefault(tuple(t[p:p + n]), set()).add((f"d{i}", p))
    assert sorted(map(sorted, by_hash.values())) \
        == sorted(map(sorted, by_gram.values()))


@given(_DOCS, st.integers(2, 4), st.data())
@settings(max_examples=60, deadline=None)
def test_strip_spans_matches_python_mask(docs, n, data):
    """_strip_spans over ARBITRARY loser pairs (valid gram starts chosen by
    hypothesis) equals the per-row Python interval mask."""
    from log_formatter_ray.ops.substr import _strip_spans

    valid = [(i, p) for i, t in enumerate(docs)
             for p in range(max(len(t) - n + 1, 0))]
    pairs = data.draw(st.lists(st.sampled_from(valid), max_size=10)
                      if valid else st.just([]))
    ldf = pd.DataFrame({
        "doc_id": [f"d{i}" for i, _ in pairs],
        "_pos": pd.array([p for _, p in pairs], dtype="int64"),
    })
    out = _strip_spans(_table(docs), ldf, "tokens", "doc_id", n).to_pandas()
    out = out.set_index("doc_id")
    for i, t in enumerate(docs):
        cover = np.zeros(len(t), bool)
        for j, p in pairs:
            if j == i:
                cover[p:p + n] = True
        expect = np.asarray(t, np.int64)[~cover]
        got = np.asarray(out.loc[f"d{i}", "tokens"], np.int64)
        assert np.array_equal(got, expect)
        assert out.loc[f"d{i}", "n_removed"] == int(cover.sum())


@given(_DOCS, st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_token_ngram_repetition_property(docs, n):
    from log_formatter_ray.ops.substr import token_ngram_repetition

    out = token_ngram_repetition(_table(docs), n=n).to_pandas()
    out = out.set_index("doc_id")
    for i, t in enumerate(docs):
        grams = [tuple(t[p:p + n]) for p in range(max(len(t) - n + 1, 0))]
        assert out.loc[f"d{i}", "n_grams"] == len(grams)
        assert out.loc[f"d{i}", "n_dup"] == len(grams) - len(set(grams))


def test_passthrough_columns_and_n_tok_recomputed():
    t = make_spanful_sequences(60, span_gram=L, seed=45)
    out = exact_substr_dedup(rd.from_arrow(t), gram_len=L, coarse=8)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source",
                               "n_removed"}
    src = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["source"].tolist() == src["source"].tolist()
    assert (df["n_tok"].to_numpy()
            == df["tokens"].map(len).to_numpy()).all()
    assert (df["n_tok"].to_numpy() + df["n_removed"].to_numpy()
            == src["n_tok"].to_numpy()).all()
