"""Corpus-wide exact-substring (duplicated token SPAN) removal.

The ExactSubstr dedup of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022): any token span of length >= ``gram_len``
that occurs more than once across the corpus is removed from every
occurrence except the globally first one (winner = smallest
``(doc_id, pos)``).  Where the paper builds one giant suffix array, this is
the Ray-Data-native equivalent: duplication of a span of length M >= L is
exactly duplication of ALL of its M-L+1 length-L grams, so electing a
winner per distinct L-gram and cutting every losing occurrence's [pos,
pos+L) window removes the full duplicated span from the losers while the
winning document keeps it intact.

No counterpart exists in the reference engine (a log formatter — see
COVERAGE.md "Training-data operators").  Plan, built from the proven
``global_line_dedup`` shape (ops/linededup.py):

- Pass A ships ONLY ``(h1, h2, id, pos)`` per valid gram start — the token
  payload never enters the shuffle.  Gram identity is a 128-bit double
  ROLLING polynomial hash computed with two prefix-sum passes per block
  (odd multiplier, modular-inverse renormalization, splitmix finalizer) —
  O(flat tokens) regardless of ``gram_len``, never a per-gram loop.
- Winner election is one coarse keyed ``map_groups`` (``mix(h1) %
  coarse`` — every occurrence of a gram lands in one partition by
  construction): vectorized sort + run-boundary scan, losers out.
- The removal set comes back as a driver broadcast below
  ``broadcast_limit`` pairs, else the docs co-partition with the pairs on
  ``hash(id)`` (one union shuffle, the ``global_line_dedup`` attach
  pattern) — a boilerplate-heavy corpus can never exhaust the driver.
- Span cutting is a scatter-add interval mask over the flat token buffer
  (+1 at starts, -1 at clipped ends, cumsum > 0 = covered) — one pass per
  batch, byte-exact pass-through for uncovered tokens.

Cost honesty at 100 TB: pass A is Θ(total token positions) rows of ~28 B
through one shuffle — inherent to EXACT substring dedup (the paper's
suffix array is likewise Θ(total tokens) of global state).  When that is
too heavy, ``ops/winnow.py`` is the sampled/approximate span-dup detector
(fingerprint density ~2/(w+1)) and ``dedup_sequences`` the whole-sequence
exact dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from log_formatter_ray.ops._shuffle import PART_COL, hash_part

# Independent odd multipliers (golden-ratio / xxhash constants) for the two
# 64-bit halves of the gram identity; equal grams always collide (same
# polynomial), distinct grams collide on BOTH halves with ~2^-128 odds on
# non-adversarial data.
_P1 = 0x9E3779B97F4A7C15
_P2 = 0xC2B2AE3D27D4EB4F
_PINV1 = pow(_P1, -1, 1 << 64)
_PINV2 = pow(_P2, -1, 1 << 64)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — spreads the polynomial hash's structured low
    bits before ``% coarse`` partitioning; equality-preserving."""
    h = h ^ (h >> np.uint64(30))
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h = h ^ (h >> np.uint64(27))
    h = h * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _rolling_gram_hash(flat: np.ndarray, starts: np.ndarray, L: int,
                       p: int, pinv: int) -> np.ndarray:
    """hash(flat[s:s+L]) for every s in ``starts``: with S the prefix sum of
    ``flat[j] * p^j`` (uint64 wraparound) and pinv = p^-1 mod 2^64,
    ``(S[s+L] - S[s]) * pinv^s`` equals ``sum_j flat[s+j] * p^j`` — the
    position-independent gram polynomial.  Three accumulate passes over the
    flat buffer, one gather; no per-gram work."""
    n = flat.size
    pow_p = np.full(n, p, dtype=np.uint64)
    if n:
        pow_p[0] = 1
    np.multiply.accumulate(pow_p, out=pow_p)
    s = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(flat.astype(np.uint64) * pow_p, out=s[1:])
    pow_pinv = np.full(max(n - L + 1, 0), pinv, dtype=np.uint64)
    if pow_pinv.size:
        pow_pinv[0] = 1
    np.multiply.accumulate(pow_pinv, out=pow_pinv)
    return (s[starts + L] - s[starts]) * pow_pinv[starts]


def _tokens_and_offsets(col) -> tuple[pa.Array, np.ndarray]:
    """Flat values + ZERO-BASED offsets for a (chunked) list column —
    ``flatten()``, never ``.values`` (a sliced block's ``.values`` is the
    full unsliced child; ADVICE r4)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return col.flatten(), off - off[0]


def _gram_keys(batch: pa.Table, tokens_col: str, id_col: str, L: int,
               coarse: int) -> pa.Table:
    """(id, pos, h1, h2, part) for every valid gram start in the batch."""
    toks, off = _tokens_and_offsets(batch[tokens_col])
    flat = toks.to_numpy(zero_copy_only=False)
    lens = np.diff(off)
    m = np.maximum(lens - L + 1, 0)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), m)
    first = np.cumsum(m) - m
    pos = (np.arange(int(m.sum()), dtype=np.int64)
           - np.repeat(first, m))
    starts = pos + np.repeat(off[:-1], m)
    h1 = _mix64(_rolling_gram_hash(flat, starts, L, _P1, _PINV1))
    h2 = _mix64(_rolling_gram_hash(flat, starts, L, _P2, _PINV2))
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_col: ids.take(pa.array(doc_idx)),
        "_pos": pa.array(pos),
        "_h1": pa.array(h1.astype(np.int64)),
        "_h2": pa.array(h2.astype(np.int64)),
        PART_COL: pa.array((h1 % np.uint64(coarse)).astype(np.int32)),
    })


def _loser_rows(group: pa.Table, id_col: str) -> pa.Table:
    """Within one coarse partition: every non-first occurrence of each
    distinct gram, ordered by ``(id, pos)`` — the SQL
    ``row_number() OVER (PARTITION BY gram ORDER BY id, pos) > 1``."""
    order = pc.sort_indices(
        group,
        sort_keys=[("_h1", "ascending"), ("_h2", "ascending"),
                   (id_col, "ascending"), ("_pos", "ascending")],
    )
    g = group.take(order)
    a = g["_h1"].to_numpy(zero_copy_only=False)
    b = g["_h2"].to_numpy(zero_copy_only=False)
    dup = np.zeros(len(g), dtype=bool)
    dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
    return g.filter(pa.array(dup)).select([id_col, "_pos"])


def _strip_spans(batch: pa.Table, ldf: pd.DataFrame, tokens_col: str,
                 id_col: str, L: int) -> pa.Table:
    """Cut every loser window [pos, pos+L) out of its document's tokens.
    ``ldf`` is the removal-pair frame ``[id_col, "_pos"]``.  Overlapping
    windows union via the interval scatter mask; untouched rows keep their
    token buffers byte-exact (filter of an all-true mask is a memcpy of
    the same values)."""
    from log_formatter_ray.ops.textstats import _per_row_sum

    toks, off = _tokens_and_offsets(batch[tokens_col])
    flat = toks
    n = len(batch)
    lens = np.diff(off)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids_np = ids.to_numpy(zero_copy_only=False)

    keep = np.ones(int(off[-1]), dtype=bool)
    if len(ldf) and n:
        row_of = pd.Series(np.arange(n), index=ids_np)
        sub = ldf[ldf[id_col].isin(row_of.index)]
        if len(sub):
            rows = row_of.loc[sub[id_col]].to_numpy()
            pos = sub["_pos"].to_numpy().astype(np.int64)
            starts = off[rows] + pos
            ends = off[rows] + np.minimum(pos + L, lens[rows])
            delta = np.zeros(int(off[-1]) + 1, dtype=np.int64)
            np.add.at(delta, starts, 1)
            np.add.at(delta, ends, -1)
            keep = np.cumsum(delta[:-1]) <= 0

    kept_counts = _per_row_sum(keep.astype(np.int64), off)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_off[1:])
    if new_off[-1] >= 2**31:
        raise ValueError("block exceeds 2^31 kept tokens; use smaller blocks")
    new_tokens = pa.ListArray.from_arrays(
        pa.array(new_off.astype(np.int32), pa.int32()),
        flat.filter(pa.array(keep)),
    )
    cols, names = [], []
    for name in batch.schema.names:
        if name in (tokens_col, "n_tok", PART_COL, "_pos", "_slot"):
            continue
        col = batch[name]
        cols.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                    else col)
        names.append(name)
    cols += [new_tokens,
             pa.array(kept_counts.astype(np.int32), pa.int32()),
             pa.array(lens - kept_counts)]
    names += [tokens_col, "n_tok", "n_removed"]
    return pa.table(dict(zip(names, cols)))


def duplicated_gram_stats(ds, tokens_col: str = "tokens",
                          id_col: str = "doc_id", gram_len: int = 50,
                          coarse: int = 256):
    """Corpus-wide duplicated-gram report (the boilerplate-SPAN detector —
    RefinedWeb-style "what repeated content dominates this corpus"): one
    row per DISTINCT length-L gram occurring >= 2 times, carrying its
    occurrence count and its globally first ``(id, pos)`` occurrence as
    the representative (deterministic: the same election order as
    :func:`exact_substr_dedup`).  Same Θ(token positions) key-only
    shuffle as the dedup — payloads never move; downstream callers
    ``sort((n desc, id, pos)).limit(k)`` for a top-k."""
    L = int(gram_len)

    def gram_stats(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("_h1", "ascending"), ("_h2", "ascending"),
                       (id_col, "ascending"), ("_pos", "ascending")],
        )
        g = group.take(order)
        a = g["_h1"].to_numpy(zero_copy_only=False)
        b = g["_h2"].to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        if len(g):
            new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(g)])
        dup = counts >= 2
        firsts = starts[dup]
        return pa.table({
            "n": pa.array(counts[dup].astype(np.int64)),
            id_col: g[id_col].take(pa.array(firsts)),
            "pos": g["_pos"].take(pa.array(firsts)),
        })

    return (
        ds.map_batches(
            lambda b: _gram_keys(b, tokens_col, id_col, L, coarse),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        .groupby(PART_COL)
        .map_groups(gram_stats, batch_format="pyarrow")
    )


def token_ngram_repetition(batch: pa.Table, n: int = 3,
                           tokens_col: str = "tokens",
                           id_col: str = "doc_id") -> pa.Table:
    """WITHIN-sequence duplicate n-gram counts — the token-level analog of
    Gopher's duplicate-line repetition signals (Rae et al. 2021 §A1.1),
    over the tokens payload instead of text.  Per document: ``n_grams``
    (total length-n gram positions) and ``n_dup`` (occurrences beyond the
    first of each distinct gram) — integer outputs so the oracle never
    compares floats; a repetition filter is ``n_dup / n_grams`` downstream.

    Pure per-batch map, NO shuffle: one 128-bit rolling gram hash pass
    (:func:`_rolling_gram_hash` — shared with :func:`exact_substr_dedup`),
    one lexsort over (row, h1, h2), run-boundary scan.  Equivalent SQL:
    ``COUNT(*) - COUNT(DISTINCT gram) GROUP BY doc_id`` over exploded
    ``list_slice`` grams."""
    toks, off = _tokens_and_offsets(batch[tokens_col])
    flat = toks.to_numpy(zero_copy_only=False)
    lens = np.diff(off)
    m = np.maximum(lens - n + 1, 0)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), m)
    first = np.cumsum(m) - m
    starts = (np.arange(int(m.sum()), dtype=np.int64)
              - np.repeat(first, m) + np.repeat(off[:-1], m))
    h1 = _rolling_gram_hash(flat, starts, n, _P1, _PINV1)
    h2 = _rolling_gram_hash(flat, starts, n, _P2, _PINV2)
    order = np.lexsort((h2, h1, row))
    r, a, b = row[order], h1[order], h2[order]
    dup = np.zeros(len(r), dtype=np.int64)
    if len(r):
        dup[1:] = (r[1:] == r[:-1]) & (a[1:] == a[:-1]) & (b[1:] == b[:-1])
    n_dup = np.zeros(len(batch), dtype=np.int64)
    np.add.at(n_dup, r, dup)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_col: ids,
        "n_grams": pa.array(m.astype(np.int64)),
        "n_dup": pa.array(n_dup),
    })


def exact_substr_dedup(
    ds,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    gram_len: int = 50,
    coarse: int = 256,
    broadcast_limit: int = 5_000_000,
):
    """Remove every non-first occurrence of each duplicated >= ``gram_len``
    token span across the WHOLE corpus (winner = smallest ``(id, pos)``).

    Returns a Dataset with ``tokens_col`` rewritten (covered positions
    cut, order preserved), ``n_tok`` recomputed, and an ``n_removed``
    count per document; all other columns pass through.  Documents
    shorter than ``gram_len`` are untouched by construction.  Equivalent
    SQL: rank every length-L gram occurrence with ``row_number() OVER
    (PARTITION BY gram ORDER BY id, pos)``, cut the union of rank>1
    windows.  Assumes ``id_col`` values are corpus-unique (the repo-wide
    doc_id contract — the removal map is keyed on id).  See the module
    docstring for the at-scale plan and the approximate alternatives.
    """
    L = int(gram_len)
    if L < 2:
        raise ValueError("gram_len must be >= 2")

    losers = (
        ds.map_batches(
            lambda b: _gram_keys(b, tokens_col, id_col, L, coarse),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        .groupby(PART_COL)
        .map_groups(lambda g: _loser_rows(g, id_col),
                    batch_format="pyarrow")
        .materialize()
    )
    n_losers = losers.count()

    if n_losers <= broadcast_limit:
        ldf = losers.to_pandas() if n_losers else pd.DataFrame(
            {id_col: [], "_pos": []}
        )
        ldf_ref = ray.put(ldf)
        return ds.map_batches(
            lambda b: _strip_spans(b, ray.get(ldf_ref), tokens_col, id_col,
                                   L),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    # co-partition docs + removal pairs on hash(id): one union shuffle,
    # spans cut per partition — the driver never holds the pairs

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out = {id_col: ids}
        for name in batch.schema.names:
            if name != id_col:
                col = batch[name]
                out[name] = (col.combine_chunks()
                             if isinstance(col, pa.ChunkedArray) else col)
        out["_pos"] = pa.nulls(len(batch), pa.int64())
        out["_slot"] = pa.array(np.zeros(len(batch), np.int8))
        out[PART_COL] = pa.array(
            hash_part(ids.to_numpy(zero_copy_only=False), coarse)
        )
        return pa.table(out)

    passthrough = [n for n in ds.schema().names if n != id_col]
    pass_types = dict(zip(ds.schema().names, ds.schema().types))

    def tag_losers(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        out = {id_col: ids}
        for name in passthrough:
            out[name] = pa.nulls(len(batch), pass_types[name])
        out["_pos"] = batch["_pos"].combine_chunks()
        out["_slot"] = pa.array(np.ones(len(batch), np.int8))
        out[PART_COL] = pa.array(
            hash_part(ids.to_numpy(zero_copy_only=False), coarse)
        )
        return pa.table(out)

    unioned = ds.map_batches(
        tag_docs, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).union(losers.map_batches(
        tag_losers, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ))

    def apply_part(group: pa.Table) -> pa.Table:
        slot = group["_slot"]
        docs = group.filter(pc.equal(slot, 0)).drop_columns(
            ["_pos", "_slot", PART_COL]
        )
        pairs = group.filter(pc.equal(slot, 1))
        ldf = pd.DataFrame({
            id_col: pairs[id_col].combine_chunks().to_numpy(
                zero_copy_only=False),
            "_pos": pairs["_pos"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64),
        })
        return _strip_spans(docs, ldf, tokens_col, id_col, L)

    return unioned.groupby(PART_COL).map_groups(
        apply_part, batch_format="pyarrow"
    )
