"""Benchmark decontamination: drop corpus documents that share any word
n-gram with a (small) benchmark/eval set.

The standard training-data hygiene stage (the reference has no analog —
this is part of the beyond-reference LLM-pipeline surface, like
``ops/dedup.py``): eval-set contamination is detected by n-gram overlap,
and contaminated documents are removed before training.

Scale shape (the broadcast-small-side plan, same as ``ops/joins.py``):

* The benchmark side is SMALL by contract (an eval suite — thousands of
  documents, ≤ ~10^7 distinct n-grams ≈ 80 MB of uint64).  Its n-gram
  hashes are computed distributed, uniqued per block, and the bounded
  union is collected once and broadcast with ``ray.put`` — never
  re-shipped per batch.
* The corpus side streams: one ``map_batches`` computes every row's
  word-n-gram hashes in a handful of vectorized calls (no per-row
  shingling loop), probes the sorted benchmark array with
  ``np.searchsorted``, and ORs hits per row with ``np.add.reduceat``.
  No shuffle, no materialization.
* Matching is on 64-bit stable hashes of the n-gram STRINGS
  (``_stable_hash64`` — process-stable siphash).  A hash collision could
  flag a clean document (false positive ≈ |corpus grams| × |bench grams|
  / 2^64 — negligible, and the conservative direction for contamination
  filtering); there are no false negatives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from log_formatter_ray.ops.dedup import _stable_hash64


def _word_ngram_strings(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row word n-gram STRINGS for a string column, vectorized.

    Returns ``(grams, row_offsets)``: ``grams`` is the flat object array
    of every row's n-gram strings in row order; ``row_offsets`` (len
    nrows+1) delimits each row's slice.  Rows with fewer than ``n``
    space-split words contribute zero n-grams (DuckDB
    ``generate_series(1, len(ws)-n+1)`` parity).

    The shingle strings are built with O(n) whole-column object-array
    concatenations over the flattened word buffer (not a per-row loop).
    """
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    counts = np.diff(offsets)
    g_counts = np.maximum(counts - (n - 1), 0)
    row_off = np.concatenate([[0], np.cumsum(g_counts)])
    total = int(offsets[-1])
    if total < n:
        return np.empty(0, dtype=object), row_off

    w = words.flatten().to_numpy(zero_copy_only=False)  # object array
    cand = w[: total - n + 1].copy()
    for k in range(1, n):
        cand = cand + " "
        cand = cand + w[k: total - n + 1 + k]

    # A candidate starting at flat position j is a real n-gram only if it
    # does not cross its row's end: for each row end e, starts e-1 .. e-n+1
    # are invalid.  (A start invalidated by a LATER row's end is always
    # already invalid via its own row's end, so no over-invalidation.)
    valid = np.ones(total - n + 1, dtype=bool)
    bad = (offsets[1:][:, None] - np.arange(1, n)[None, :]).ravel()
    bad = bad[(bad >= 0) & (bad < valid.size)]
    valid[bad] = False

    return cand[valid], row_off


def _word_ngram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row word n-gram hashes — :func:`_word_ngram_strings` hashed in
    ONE ``_stable_hash64`` call; same ``(values, row_offsets)`` layout."""
    grams, row_off = _word_ngram_strings(texts, n)
    if not grams.size:
        return np.empty(0, dtype=np.uint64), row_off
    return _stable_hash64(grams), row_off


def benchmark_ngram_hashes(bench_ds, text_col: str = "text", n: int = 3) -> np.ndarray:
    """SORTED unique uint64 n-gram hash array of the benchmark corpus.

    Computed distributed (per-block unique), unioned on the driver — the
    benchmark side is small by contract, so the union is bounded (an eval
    suite's distinct-gram count, not the corpus's).  Broadcast the result
    with ``ray.put`` and pass the ref to :func:`decontaminate`.
    """
    def per_block(batch: pa.Table) -> pa.Table:
        h, _ = _word_ngram_hashes(batch[text_col], n)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = bench_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    # bounded driver collect: per-block-unique hash partials of a small set
    df = parts.to_pandas()
    if df.empty:
        return np.empty(0, dtype=np.uint64)
    return np.unique(df["h"].to_numpy().view(np.uint64))


def flag_contaminated(ds, bench_hashes, text_col: str = "text", n: int = 3,
                      out_col: str = "contaminated"):
    """Append a bool ``out_col``: does the row share ≥1 word n-gram with
    the benchmark set?  ``bench_hashes`` is the sorted array from
    :func:`benchmark_ngram_hashes` (or an ``ObjectRef`` to it)."""
    ref = (bench_hashes if isinstance(bench_hashes, ray.ObjectRef)
           else ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64))))

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        h, row_off = _word_ngram_hashes(batch[text_col], n)
        hit = np.zeros(len(h), dtype=bool)
        if h.size and bench.size:
            pos = np.searchsorted(bench, h)
            inb = pos < bench.size
            hit[inb] = bench[pos[inb]] == h[inb]
        per_row = np.zeros(batch.num_rows, dtype=np.int64)
        nonempty = row_off[:-1] < row_off[1:]
        if hit.size:
            per_row[nonempty] = np.add.reduceat(
                hit.astype(np.int64), row_off[:-1][nonempty]
            )
        return batch.append_column(out_col, pa.array(per_row > 0))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def decontaminate(ds, bench_hashes, text_col: str = "text", n: int = 3):
    """Rows of ``ds`` sharing NO word n-gram with the benchmark set —
    the training-corpus side of eval-set decontamination."""
    flagged = flag_contaminated(ds, bench_hashes, text_col=text_col, n=n)
    return flagged.map_batches(
        lambda b: b.filter(pc.invert(b["contaminated"])).drop_columns(
            ["contaminated"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Token-level decontamination (the tokens-axis variant: pretokenized
# corpora are decontaminated on token-id n-grams, no text round-trip)
# ---------------------------------------------------------------------------

def _token_ngram_hashes(tokens, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row token-id n-gram hashes for a ``list<int32>`` column.

    Returns ``(hashes, row_offsets)`` in the :func:`_word_ngram_hashes`
    layout.  Each window hash is a degree-(n−1) polynomial over golden-
    ratio-mixed token values — n whole-array multiply-adds, no per-row or
    per-window Python.  Exact n-gram identity up to 64-bit collisions
    (≈|grams|²/2⁶⁵ false-positive odds — negligible and conservative for
    contamination filtering), matching the word path's contract."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    counts = np.diff(offsets)
    g_counts = np.maximum(counts - (n - 1), 0)
    row_off = np.concatenate([[0], np.cumsum(g_counts)])
    total = int(offsets[-1])
    if total < n:
        return np.empty(0, dtype=np.uint64), row_off

    from log_formatter_ray.ops._chunk import row_chunks

    flat = np.asarray(tokens.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.uint64)
    p = np.uint64(1099511628211)
    # per row-aligned cache-resident chunk: the n multiply-add passes run
    # over an L2-sized slice instead of the whole block (ops/_chunk.py);
    # windows never cross rows, so chunk outputs concatenate identically
    cut = row_chunks(offsets)
    outs = []
    for c0, c1 in zip(cut[:-1], cut[1:]):
        s0, s1 = int(offsets[c0]), int(offsets[c1])
        tot = s1 - s0
        if tot < n:
            continue
        o = offsets[c0:c1 + 1] - s0
        f = (flat[s0:s1] + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        acc = np.zeros(tot - n + 1, dtype=np.uint64)
        for k in range(n):
            acc = acc * p + f[k: tot - n + 1 + k]
        # invalidate windows that cross a row boundary (same mask as the
        # word-n-gram builder)
        valid = np.ones(tot - n + 1, dtype=bool)
        bad = (o[1:][:, None] - np.arange(1, n)[None, :]).ravel()
        bad = bad[(bad >= 0) & (bad < valid.size)]
        valid[bad] = False
        outs.append(acc[valid])
    h = np.concatenate(outs) if outs else np.empty(0, dtype=np.uint64)
    return h, row_off


def benchmark_token_ngram_hashes(
    bench_ds, tokens_col: str = "tokens", n: int = 8
) -> np.ndarray:
    """SORTED unique uint64 token-n-gram hashes of the eval set (small by
    contract; per-block unique, bounded driver union — the
    :func:`benchmark_ngram_hashes` plan on the tokens column)."""
    def per_block(batch: pa.Table) -> pa.Table:
        h, _ = _token_ngram_hashes(batch[tokens_col], n)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = bench_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    df = parts.to_pandas()
    if df.empty:
        return np.empty(0, dtype=np.uint64)
    return np.unique(df["h"].to_numpy().view(np.uint64))


def flag_contaminated_tokens(ds, bench_hashes, tokens_col: str = "tokens",
                             n: int = 8, out_col: str = "contaminated"):
    """Append bool ``out_col``: does the row share ≥1 token n-gram with
    the (broadcast) eval-set hash array?  Streaming, no shuffle — the
    corpus's token payload never moves."""
    ref = (bench_hashes if isinstance(bench_hashes, ray.ObjectRef)
           else ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64))))

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        h, row_off = _token_ngram_hashes(batch[tokens_col], n)
        hit = np.zeros(len(h), dtype=bool)
        if h.size and bench.size:
            pos = np.searchsorted(bench, h)
            inb = pos < bench.size
            hit[inb] = bench[pos[inb]] == h[inb]
        per_row = np.zeros(batch.num_rows, dtype=np.int64)
        nonempty = row_off[:-1] < row_off[1:]
        if hit.size:
            per_row[nonempty] = np.add.reduceat(
                hit.astype(np.int64), row_off[:-1][nonempty]
            )
        return batch.append_column(out_col, pa.array(per_row > 0))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def contamination_counts_tokens(ds, bench_hashes, tokens_col: str = "tokens",
                                id_col: str = "doc_id", n: int = 8):
    """SCORED decontamination: per row, how many of its token n-gram
    occurrences appear in the (broadcast) eval set — ``(id, n_grams,
    n_hit)`` integers, so callers can threshold on overlap FRACTION
    instead of the binary drop of :func:`decontaminate_tokens` (the
    standard "allow ≤x% incidental overlap" contamination policy).
    Same streaming searchsorted probe, no shuffle, payload never moves."""
    ref = (bench_hashes if isinstance(bench_hashes, ray.ObjectRef)
           else ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64))))

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        h, row_off = _token_ngram_hashes(batch[tokens_col], n)
        hit = np.zeros(len(h), dtype=bool)
        if h.size and bench.size:
            pos = np.searchsorted(bench, h)
            inb = pos < bench.size
            hit[inb] = bench[pos[inb]] == h[inb]
        per_row = np.zeros(batch.num_rows, dtype=np.int64)
        nonempty = row_off[:-1] < row_off[1:]
        if hit.size:
            per_row[nonempty] = np.add.reduceat(
                hit.astype(np.int64), row_off[:-1][nonempty]
            )
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids,
            "n_grams": pa.array(np.diff(row_off).astype(np.int64)),
            "n_hit": pa.array(per_row),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def decontaminate_tokens(ds, bench_hashes, tokens_col: str = "tokens",
                         n: int = 8):
    """Rows of ``ds`` sharing NO token n-gram with the eval set."""
    flagged = flag_contaminated_tokens(ds, bench_hashes,
                                       tokens_col=tokens_col, n=n)
    return flagged.map_batches(
        lambda b: b.filter(pc.invert(b["contaminated"])).drop_columns(
            ["contaminated"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
