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

    Output: (id_col, chunk_idx:int32, tokens, n_tok:int32).  Token values
    are copied ONCE via a single vectorized gather on the flat int32
    buffer (chunks are contiguous, so this is one ``take``-shaped pass —
    no per-chunk Python, no per-token boxing).
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

    # one vectorized multi-range gather over the flat value buffer
    flat = tokens.values.to_numpy(zero_copy_only=False)
    sizes = ends - starts
    total_out = int(new_offsets[-1])
    chunk_of_out = np.repeat(np.arange(total, dtype=np.int64), sizes)
    within = np.arange(total_out, dtype=np.int64) - np.repeat(
        new_offsets[:-1], sizes
    )
    gathered = flat[starts[chunk_of_out] + within].astype(np.int32, copy=False)
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

    # Token assembly is ONE vectorized multi-range gather over the flat
    # int32 buffer (never per-token Python): flatten the bin membership,
    # gather every member's value range, and rebuild the list column from
    # offsets — the FFD loop above only touches per-SEQUENCE metadata.
    member_rows = (
        np.concatenate([np.asarray(m, dtype=np.int64) for m in bins])
        if bins else np.zeros(0, np.int64)
    )
    bin_sizes = np.asarray([len(m) for m in bins], dtype=np.int64)
    seg_starts = offsets[member_rows]
    seg_lens = lens[member_rows]
    total_out = int(seg_lens.sum())
    seg_cum = np.zeros(len(member_rows) + 1, dtype=np.int64)
    np.cumsum(seg_lens, out=seg_cum[1:])
    seg_of_out = np.repeat(np.arange(len(member_rows), dtype=np.int64), seg_lens)
    within = np.arange(total_out, dtype=np.int64) - np.repeat(seg_cum[:-1], seg_lens)
    values = flat[seg_starts[seg_of_out] + within].astype(np.int32, copy=False)

    member_off = np.zeros(len(bins) + 1, dtype=np.int64)
    np.cumsum(bin_sizes, out=member_off[1:])
    bin_tok_counts = seg_cum[member_off[1:]] - seg_cum[member_off[:-1]]
    bin_tok_off = np.zeros(len(bins) + 1, dtype=np.int64)
    np.cumsum(bin_tok_counts, out=bin_tok_off[1:])
    tokens_out = pa.ListArray.from_arrays(
        pa.array(bin_tok_off.astype(np.int32), pa.int32()),
        pa.array(values, pa.int32()),
    )
    # per-member boundary = cumulative tokens within its bin
    bounds_flat = seg_cum[1:] - np.repeat(bin_tok_off[:-1], bin_sizes)
    boundaries = pa.ListArray.from_arrays(
        pa.array(member_off.astype(np.int32), pa.int32()),
        pa.array(bounds_flat.astype(np.int32), pa.int32()),
    )
    doc_ids = pa.ListArray.from_arrays(
        pa.array(member_off.astype(np.int32), pa.int32()),
        ids.take(pa.array(member_rows)),
    )
    return pa.table(
        {
            "pack_id": pa.array(range(len(bins)), pa.int64()),
            "tokens": tokens_out,
            "n_tok": pa.array(bin_tok_counts.astype(np.int32)),
            "n_seqs": pa.array(bin_sizes.astype(np.int32)),
            "doc_ids": doc_ids,
            "boundaries": boundaries,
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
        hist = pa.ListArray.from_arrays(
            pa.array([0, vocab_size], pa.int32()), pa.array(counts, pa.int64())
        )
        return pa.table({"hist": hist})

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
        hl = b["hist"].combine_chunks()
        flat = np.asarray(hl.flatten())
        total += flat.reshape(-1, vocab_size).sum(axis=0)
    return total
