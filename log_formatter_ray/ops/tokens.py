"""Token-sequence operators: chunking, packing, vocabulary histogram.

These operate on the canonical payload column ``tokens: list<int32>``
(BASELINE.json input_hint) — the operations a training-data pipeline runs
between raw sequences and model-ready batches:

* ``chunk_sequences`` — split every row into ≤ ``max_len`` chunks
  (1 row → ⌈n_tok/max_len⌉ rows), fully vectorized on the flat value
  buffer: no per-row Python, no copy of token values beyond the one
  ``ListArray.from_arrays`` re-slice.
* ``pack_sequences`` — greedy first-fit packing of whole sequences into
  fixed ``context_len`` buckets (one output row per packed context, with
  the member doc_ids and boundary offsets).  Packing is per-batch (a block
  is the packing window) — the standard streaming approximation; global
  optimal packing would need a shuffle and buys ~1% fill.
* ``token_histogram`` — corpus-wide token-id frequency via per-batch
  ``np.bincount`` partials (vocab-sized int64 vectors) merged driver-side:
  the mergeable-sketch pattern, no shuffle of token data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from log_formatter_ray.fixtures import VOCAB_SIZE


def chunk_sequences(
    batch: pa.Table, max_len: int = 512, tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> pa.Table:
    """1 row → ⌈n_tok/max_len⌉ rows of ≤ max_len tokens.

    Output: (id_col, chunk_idx:int32, tokens, n_tok:int32).  Token VALUES
    are zero-copy slices of the input buffer (offsets are rebuilt; the
    int32 payload is not copied).
    """
    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    n_chunks = np.maximum((lens + max_len - 1) // max_len, 1).astype(np.int64)

    # new chunk boundaries: for each row, offsets start, start+max_len, ...
    total = int(n_chunks.sum())
    row_of_chunk = np.repeat(np.arange(len(lens)), n_chunks)
    # chunk index within row: 0..n_chunks[i]-1
    chunk_idx = np.arange(total) - np.repeat(
        np.cumsum(n_chunks) - n_chunks, n_chunks
    )
    starts = offsets[row_of_chunk] + chunk_idx * max_len
    ends = np.minimum(starts + max_len, offsets[row_of_chunk + 1])
    # empty rows produce one empty chunk
    ends = np.maximum(ends, starts)

    new_offsets = np.empty(total + 1, dtype=np.int64)
    new_offsets[0] = 0
    np.cumsum(ends - starts, out=new_offsets[1:])

    values = tokens.values
    # gather the value ranges: build via one take on ranges → use
    # np concatenate of slices is a copy; instead reuse the arrow buffer
    # when chunks are contiguous per row (they are) by re-slicing:
    flat = values.to_numpy(zero_copy_only=False)
    gathered = np.concatenate(
        [flat[s:e] for s, e in zip(starts, ends)] or [np.array([], np.int32)]
    ).astype(np.int32, copy=False)
    new_tokens = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(gathered, pa.int32())
    )

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(row_of_chunk)),
            "chunk_idx": pa.array(chunk_idx.astype(np.int32)),
            "tokens": new_tokens,
            "n_tok": pa.array((ends - starts).astype(np.int32)),
        }
    )


def pack_sequences(
    batch: pa.Table, context_len: int = 2048, tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> pa.Table:
    """Greedy first-fit-decreasing packing of whole sequences into
    ``context_len`` buckets within the batch.

    Output per packed context: (pack_id:int64, tokens, n_tok:int32,
    n_seqs:int32, doc_ids:list<string|int>, boundaries:list<int32>).
    Sequences longer than ``context_len`` are truncated (chunk first with
    ``chunk_sequences`` if that is not wanted).
    """
    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    lens = np.minimum(
        pa.compute.list_value_length(tokens).to_numpy(zero_copy_only=False),
        context_len,
    ).astype(np.int64)
    order = np.argsort(-lens, kind="stable")  # decreasing

    bins: list[list[int]] = []
    space: list[int] = []
    for i in order:
        L = int(lens[i])
        placed = False
        for b, s in enumerate(space):
            if s >= L:
                bins[b].append(int(i))
                space[b] -= L
                placed = True
                break
        if not placed:
            bins.append([int(i)])
            space.append(context_len - L)

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    flat = tokens.values.to_numpy(zero_copy_only=False)
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

    out_tokens, out_ids, out_bounds = [], [], []
    for members in bins:
        parts, bounds, pos = [], [], 0
        for i in members:
            seg = flat[offsets[i] : offsets[i] + lens[i]]
            parts.append(seg)
            pos += len(seg)
            bounds.append(pos)
        out_tokens.append(np.concatenate(parts).astype(np.int32, copy=False))
        out_ids.append([ids[i].as_py() for i in members])
        out_bounds.append(bounds)

    return pa.table(
        {
            "pack_id": pa.array(range(len(bins)), pa.int64()),
            "tokens": pa.array([t.tolist() for t in out_tokens], pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in out_tokens], pa.int32()),
            "n_seqs": pa.array([len(m) for m in bins], pa.int32()),
            "doc_ids": pa.array(out_ids),
            "boundaries": pa.array(out_bounds, pa.list_(pa.int32())),
        }
    )


def _histogram_partial(vocab_size: int, tokens_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        tokens = batch[tokens_col]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.values.to_numpy(zero_copy_only=False)
        # ids outside [0, vocab_size) would crash bincount (negative) or
        # return a longer array that breaks the driver merge — drop them
        flat = flat[(flat >= 0) & (flat < vocab_size)]
        counts = np.bincount(flat, minlength=vocab_size).astype(np.int64)
        return pa.table({"hist": pa.array([counts.tolist()], pa.list_(pa.int64()))})

    return fn


def token_histogram(ds, vocab_size: int = VOCAB_SIZE, tokens_col: str = "tokens") -> np.ndarray:
    """Corpus token-id frequency vector — one bincount per block, merged on
    the driver (vocab_size × 8 bytes per block ≈ 400 KB; mergeable-sketch
    pattern, no shuffle)."""
    partials = ds.map_batches(
        _histogram_partial(vocab_size, tokens_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    total = np.zeros(vocab_size, dtype=np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for row in b["hist"].to_pylist():
            total += np.asarray(row, dtype=np.int64)
    return total
