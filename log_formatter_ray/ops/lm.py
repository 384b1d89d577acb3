"""Unigram language-model quality scoring — the "model scoring" stage of
a training-data pipeline (CCNet/Wenzek et al. 2020 score documents with a
KenLM; the unigram form is the dependency-free analog with the identical
Ray shape: corpus pass → small broadcast model → actor-pool scorer).

Two passes, both bounded:

1. :func:`build_unigram_lm` — distributed total term counts (per-block
   partial ``group_by`` + one Sum groupby — the ``build_top_vocab``
   pattern), floored by ``min_count`` / capped at ``max_vocab`` BEFORE the
   driver collect, then add-one-smoothed log probabilities.
2. :class:`UnigramScorer` — an actor-pool ``map_batches`` stage holding
   the broadcast model (``ray.get`` once per actor in ``__init__``, the
   stateful-stage contract) that adds per-document mean token log-prob
   and perplexity, fully vectorized (one searchsorted + one reduceat per
   batch).

Out-of-vocabulary words score at the smoothed OOV floor, so a capped
vocabulary degrades smoothly instead of crashing on tail tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def build_unigram_lm(ds, text_col: str = "text", min_count: int = 1,
                     max_vocab: int | None = None):
    """Corpus unigram model → ``(vocab, logp, oov_logp)``: a sorted object
    ndarray of words, aligned float64 log₂-probabilities (add-one
    smoothing over the RETAINED vocabulary + one OOV bucket), and the OOV
    log-probability.  ``min_count``/``max_vocab`` bound the driver collect
    (the ``build_doc_freq`` discipline)."""
    from ray.data.aggregate import Sum

    def word_counts(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        t = pa.table({"word": words.flatten()})
        agg = t.group_by(["word"]).aggregate([([], "count_all")])
        return agg.rename_columns(
            ["n" if c == "count_all" else c for c in agg.column_names]
        )

    counts = (
        ds.map_batches(word_counts, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        counts = counts.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
    if max_vocab is not None:
        counts = counts.sort(["n", "word"], descending=[True, False]).limit(
            max_vocab
        )
    df = counts.to_pandas()
    order = np.argsort(df["word"].to_numpy(object))
    vocab = df["word"].to_numpy(object)[order]
    n = df["n"].to_numpy(np.int64)[order]
    total = int(n.sum())
    denom = total + len(vocab) + 1  # add-one over vocab + OOV bucket
    logp = np.log2((n + 1) / denom)
    oov_logp = float(np.log2(1.0 / denom))
    return vocab, logp, oov_logp


def add_unigram_logprob(
    batch: pa.Table, vocab: np.ndarray, logp: np.ndarray, oov_logp: float,
    text_col: str = "text", id_col: str = "doc_id",
) -> pa.Table:
    """Vectorized scorer core: per-document mean log₂-prob over
    space-split words (OOV → ``oov_logp``) and the implied perplexity.
    Output: ``(id_col, n_words:int64, logprob_mean:float64,
    ppl:float64)``; empty/null docs score ``logprob_mean = oov_logp``."""
    words = pc.split_pattern(pc.fill_null(batch[text_col], ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    n_words = np.diff(offsets)
    w = words.flatten().to_numpy(zero_copy_only=False)
    wid = np.searchsorted(vocab, w)
    in_vocab = wid < len(vocab)
    if in_vocab.any():
        in_vocab[in_vocab] = vocab[wid[in_vocab]] == w[in_vocab]
    scores = np.full(len(w), oov_logp, np.float64)
    scores[in_vocab] = logp[wid[in_vocab]]
    sums = np.add.reduceat(scores, np.minimum(offsets[:-1], max(len(w) - 1, 0))) \
        if len(w) else np.zeros(len(n_words))
    # reduceat repeats the value at equal consecutive indices (empty rows);
    # mask them to the OOV floor explicitly
    nz = n_words > 0
    mean = np.full(len(n_words), oov_logp, np.float64)
    mean[nz] = sums[nz] / n_words[nz]
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words.astype(np.int64)),
        "logprob_mean": pa.array(mean),
        "ppl": pa.array(np.exp2(-mean)),
    })


class UnigramScorer:
    """Actor-pool stage: ``(vocab_ref, logp_ref, oov_logp)`` fetched from
    the object store ONCE per actor in ``__init__`` (zero-copy for the
    float table), then :func:`add_unigram_logprob` per batch.  Use with
    ``map_batches(UnigramScorer, fn_constructor_args=(...),
    concurrency=N)``."""

    def __init__(self, vocab_ref, logp_ref, oov_logp: float,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        self.vocab = ray.get(vocab_ref)
        self.logp = ray.get(logp_ref)
        self.oov_logp = oov_logp
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return add_unigram_logprob(
            batch, self.vocab, self.logp, self.oov_logp,
            text_col=self.text_col, id_col=self.id_col,
        )


def score_corpus_unigram(
    ds, text_col: str = "text", id_col: str = "doc_id",
    min_count: int = 1, max_vocab: int | None = None, concurrency=(1, 8),
):
    """End-to-end: build the LM over ``ds``, broadcast it, score every
    document with the actor pool → Dataset (id, n_words, logprob_mean,
    ppl).  The input is consumed twice (count pass + score pass) — pass a
    re-readable Dataset (a parquet read), not an exhausted stream."""
    import ray

    vocab, logp, oov = build_unigram_lm(
        ds, text_col=text_col, min_count=min_count, max_vocab=max_vocab
    )
    vocab_ref, logp_ref = ray.put(vocab), ray.put(logp)
    return ds.map_batches(
        UnigramScorer,
        fn_constructor_args=(vocab_ref, logp_ref, oov),
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", batch_size=None, concurrency=concurrency,
    )
