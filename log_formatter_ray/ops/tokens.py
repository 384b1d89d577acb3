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
  is the packing window) — the standard streaming approximation.
* ``pack_sequences_spill`` — GLOBAL packing without a corpus shuffle:
  per-block packs at ≥ threshold fill stream straight to parquet; only
  the under-filled tails (≪ 1% of the corpus) are repartitioned and
  re-packed over wide windows.  ``unpack_sequences`` is the (zero-copy)
  inverse used by the refine stage.
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
    are GENUINELY zero-copy: chunk boundaries tile the flat value buffer
    in order (every token of every row lands in exactly one chunk), so the
    output list column is the SAME Arrow buffer under a new offsets array
    — no gather, no copy, no per-token work at all.
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

    # Chunk ranges tile the value buffer: ends[i] == starts[i+1] for every
    # consecutive chunk (within a row by construction, across rows because
    # the last chunk ends exactly at the next row's start).  The offsets
    # vector is therefore just [starts..., last_end] over the ORIGINAL
    # values buffer — a zero-copy re-slice.
    boundaries = np.empty(total + 1, dtype=np.int64)
    boundaries[:-1] = starts
    boundaries[-1] = offsets[-1]
    if boundaries[-1] >= 2**31:
        raise ValueError("block exceeds 2^31 tokens; split into smaller blocks")
    new_tokens = pa.ListArray.from_arrays(
        pa.array(boundaries.astype(np.int32), pa.int32()), tokens.values
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


def chunk_sequences_overlap(
    batch: pa.Table, window: int = 512, stride: int = 256,
    tokens_col: str = "tokens", id_col: str = "doc_id",
) -> pa.Table:
    """Sliding-window chunking WITH overlap — the eval-perplexity / long-doc
    prep convention: chunks start at 0, stride, 2·stride, … and STOP at the
    first window that reaches the document end (so no trailing chunk is
    fully contained in its predecessor).  ``stride == window`` degenerates
    to :func:`chunk_sequences` boundaries (which stays the zero-copy fast
    path — overlapping windows force one gather here).

    Per doc: k = 1 if n <= window else ceil((n-window)/stride)+1 chunks;
    chunk j = tokens[j·stride : j·stride+window] (last one shorter).
    Output: (id_col, chunk_idx:int32, tokens, n_tok:int32).  Vectorized:
    chunk layout from arithmetic on lengths, token assembly is ONE
    ``take`` gather over the flat value buffer — no per-chunk Python.
    """
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    n_chunks = np.where(
        lens <= window, 1, (lens - window + stride - 1) // stride + 1
    ).astype(np.int64)

    total = int(n_chunks.sum())
    row_of_chunk = np.repeat(np.arange(len(lens)), n_chunks)
    chunk_idx = np.arange(total) - np.repeat(
        np.cumsum(n_chunks) - n_chunks, n_chunks
    )
    local_start = chunk_idx * stride
    chunk_lens = np.minimum(local_start + window, lens[row_of_chunk]) \
        - local_start
    chunk_lens = np.maximum(chunk_lens, 0)  # empty rows: one empty chunk

    new_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(chunk_lens, out=new_off[1:])
    if new_off[-1] >= 2**31:
        raise ValueError("block exceeds 2^31 chunk tokens; split blocks")
    # gather indices: each chunk's flat range, laid out back to back
    gather = (np.arange(int(new_off[-1]), dtype=np.int64)
              - np.repeat(new_off[:-1], chunk_lens)
              + np.repeat(offsets[row_of_chunk] + local_start, chunk_lens))
    # flatten() so a sliced block's child matches the gather coordinates
    base = offsets[0] if len(offsets) else 0
    flat = tokens.flatten()
    new_tokens = pa.ListArray.from_arrays(
        pa.array(new_off.astype(np.int32), pa.int32()),
        flat.take(pa.array(gather - base)),
    )
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(row_of_chunk)),
            "chunk_idx": pa.array(chunk_idx.astype(np.int32)),
            "tokens": new_tokens,
            "n_tok": pa.array(chunk_lens.astype(np.int32)),
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

    # First-fit-decreasing via a max segment tree over bin free space:
    # "lowest-numbered bin with space >= L" in O(log bins) instead of the
    # naive O(bins) scan per sequence (identical placement, just fast).
    n_rows_b = len(order)
    size = 1
    while size < max(n_rows_b, 1):
        size *= 2
    tree = [0] * (2 * size)  # tree[size + b] = free space of bin b
    bins: list[list[int]] = []
    for i, L in zip(order.tolist(), lens[order].tolist()):
        if bins and tree[1] >= L:
            node = 1
            while node < size:
                node = 2 * node if tree[2 * node] >= L else 2 * node + 1
            b = node - size
            bins[b].append(i)
            tree[node] -= L
        else:
            b = len(bins)
            bins.append([i])
            node = size + b
            tree[node] = context_len - L
        node //= 2
        while node:
            tree[node] = max(tree[2 * node], tree[2 * node + 1])
            node //= 2

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    flat = tokens.values.to_numpy(zero_copy_only=False)
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

    # Token assembly: one memcpy per SEQUENCE segment into a single int32
    # buffer (never per-token Python — building the list column from this
    # buffer + offsets is what avoids the pa.array(tolist()) boxing trap).
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
    values = np.empty(total_out, dtype=np.int32)
    for i in range(len(member_rows)):  # per-segment memcpy, not per-token
        s = seg_starts[i]
        values[seg_cum[i] : seg_cum[i + 1]] = flat[s : s + seg_lens[i]]

    member_off = np.zeros(len(bins) + 1, dtype=np.int64)
    np.cumsum(bin_sizes, out=member_off[1:])
    bin_tok_counts = seg_cum[member_off[1:]] - seg_cum[member_off[:-1]]
    bin_tok_off = np.zeros(len(bins) + 1, dtype=np.int64)
    np.cumsum(bin_tok_counts, out=bin_tok_off[1:])
    if total_out >= 2**31:  # same loud guard as chunk_sequences/fixtures
        raise ValueError("packed block exceeds 2^31 tokens; use smaller blocks")
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


def unpack_sequences(
    packs: pa.Table, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> pa.Table:
    """Inverse of ``pack_sequences``: pack rows → (id_col, tokens) sequence
    rows (token values truncated at the pack's context_len, exactly as
    packed).  Zero-copy when the pack members tile the value buffer in
    order (always true for freshly-packed or filtered pack tables — a
    vectorized tile check falls back to per-segment memcpy otherwise)."""
    import pyarrow.compute as pc

    doc_ids = packs["doc_ids"]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if len(packs) == 0:
        return pa.table(
            {
                id_col: pa.nulls(0, doc_ids.type.value_type),
                tokens_col: pa.ListArray.from_arrays(
                    pa.array([0], pa.int32()), pa.array([], pa.int32())
                ),
            }
        )
    tokens = packs[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    bounds = packs["boundaries"]
    if isinstance(bounds, pa.ChunkedArray):
        bounds = bounds.combine_chunks()

    tok_off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    mem_counts = pc.list_value_length(doc_ids).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    mem_off = np.zeros(len(packs) + 1, dtype=np.int64)
    np.cumsum(mem_counts, out=mem_off[1:])
    bflat = np.asarray(bounds.flatten()).astype(np.int64)  # per-member END
    pack_of_mem = np.repeat(np.arange(len(packs)), mem_counts)
    starts_within = np.r_[0, bflat[:-1]]
    starts_within[mem_off[:-1][mem_counts > 0]] = 0
    g_start = tok_off[:-1][pack_of_mem] + starts_within
    g_end = tok_off[:-1][pack_of_mem] + bflat

    tile = (
        len(g_start)
        and g_start[0] == tok_off[0]
        and g_end[-1] == tok_off[-1]
        and np.array_equal(g_start[1:], g_end[:-1])
    )
    if tile:
        boundaries = np.r_[g_start, tok_off[-1]]
        if boundaries[-1] >= 2**31:
            raise ValueError("block exceeds 2^31 tokens; use smaller blocks")
        seq_tokens = pa.ListArray.from_arrays(
            pa.array(boundaries.astype(np.int32), pa.int32()), tokens.values
        )
    else:  # gather: one memcpy per member segment
        seg_lens = g_end - g_start
        out_off = np.zeros(len(g_start) + 1, dtype=np.int64)
        np.cumsum(seg_lens, out=out_off[1:])
        if out_off[-1] >= 2**31:
            raise ValueError("block exceeds 2^31 tokens; use smaller blocks")
        flat = tokens.values.to_numpy(zero_copy_only=False)
        values = np.empty(int(out_off[-1]), dtype=np.int32)
        for i in range(len(g_start)):
            values[out_off[i] : out_off[i + 1]] = flat[g_start[i] : g_end[i]]
        seq_tokens = pa.ListArray.from_arrays(
            pa.array(out_off.astype(np.int32), pa.int32()),
            pa.array(values, pa.int32()),
        )
    return pa.table({id_col: doc_ids.flatten(), tokens_col: seq_tokens})


class _PackAndSpill:
    """Stage operator for ``pack_sequences_spill``: pack the batch, STREAM
    the packs that reached ``fill_threshold`` straight to parquet (one
    content-hash-named file per batch — the flagship sink's
    retry-idempotent pattern, flagship.py:124-184), and return ONLY the
    under-filled packs' sequences for the refine stage."""

    def __init__(self, packs_dir: str, context_len: int, tokens_col: str,
                 id_col: str, fill_threshold: float, stage: str):
        self.packs_dir = packs_dir
        self.context_len = context_len
        self.tokens_col = tokens_col
        self.id_col = id_col
        self.min_tok = int(np.ceil(fill_threshold * context_len))
        self.stage = stage

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        empty_seqs = batch.select([self.id_col, self.tokens_col]).slice(0, 0)
        if len(batch) == 0:
            return empty_seqs
        packs = pack_sequences(
            batch, self.context_len, tokens_col=self.tokens_col,
            id_col=self.id_col,
        )
        full_mask = pc.greater_equal(packs["n_tok"], self.min_tok)
        full = packs.filter(full_mask)
        if len(full):
            os.makedirs(self.packs_dir, exist_ok=True)
            first = full["doc_ids"][0].as_py()[0]
            last = full["doc_ids"][len(full) - 1].as_py()[-1]
            tot = int(pc.sum(full["n_tok"]).as_py())
            name = hashlib.sha1(
                f"{self.stage}|{first}|{last}|{len(full)}|{tot}".encode()
            ).hexdigest()[:16]
            pq.write_table(
                full, os.path.join(self.packs_dir, f"{name}.parquet")
            )
        partial = packs.filter(pc.invert(full_mask))
        if len(partial) == 0:
            return empty_seqs
        return unpack_sequences(partial, self.tokens_col, self.id_col)


def pack_sequences_spill(
    ds,
    out_dir: str,
    context_len: int = 2048,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    fill_threshold: float = 0.995,
    refine_partitions: int = 16,
) -> dict:
    """GLOBAL (cross-block) packing without a corpus shuffle — the
    two-level pack-and-spill plan:

    1. **Pack + spill**: each block is FFD-packed; packs at ≥
       ``fill_threshold`` fill stream straight to ``out_dir/packs/``
       (write-side sink, content-hashed filenames → retry-idempotent);
       only the under-filled tail packs' sequences — a couple of packs'
       worth per block, ≪ 1% of the corpus — travel on.
    2. **Refine**: the remainder is repartitioned to ``refine_partitions``
       wide windows and packed again, threshold 0, into the same dir.

    Per-batch FFD already reaches ~99.7% fill; the loss is almost entirely
    the per-window tail, so refining ONLY the tails recovers global-grade
    fill (≥ the single-window fill, measured in tests) while the full
    packs never leave their producing task — at 100 TB the alternative
    (a corpus-wide shuffle for a true global FFD) moves ~10⁵× more data
    for <0.3% extra fill.  Output files are resumable/partitioned; a
    global pack id is (file, pack_id).

    Returns ``{path, n_packs, n_seqs, total_tokens, fill}`` (stats read
    back from the parquet footers' columns, never the token payload).

    Content-hashed filenames make a RETRIED task overwrite its own file
    byte-for-byte; a fresh ``out_dir`` per job run is still required (a
    rerun re-packs everything — use the flagship's manifest pattern on
    top if per-shard resume is needed).
    """
    import os

    import ray.data as rd

    packs_dir = os.path.join(out_dir, "packs")
    os.makedirs(packs_dir, exist_ok=True)
    stage1 = ds.map_batches(
        _PackAndSpill(packs_dir, context_len, tokens_col, id_col,
                      fill_threshold, "s1"),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    remainder = stage1.repartition(refine_partitions)
    stage2 = remainder.map_batches(
        _PackAndSpill(packs_dir, context_len, tokens_col, id_col, 0.0, "s2"),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    leftover = stage2.count()  # drives both stages; threshold 0 spills all
    if leftover:
        raise AssertionError(f"refine stage left {leftover} unpacked rows")
    import glob as _glob

    if not _glob.glob(os.path.join(packs_dir, "*.parquet")):
        # an empty (or fully-filtered) input is a valid no-op, not a crash
        return {
            "path": packs_dir, "n_packs": 0, "n_seqs": 0,
            "total_tokens": 0, "fill": 0.0,
        }
    from log_formatter_ray.sources import read_parquet_clean

    stats = read_parquet_clean(
        packs_dir, columns=["n_tok", "n_seqs"]
    ).materialize()
    n_packs = stats.count()
    total_tokens = int(stats.sum("n_tok")) if n_packs else 0
    n_seqs = int(stats.sum("n_seqs")) if n_packs else 0
    return {
        "path": packs_dir,
        "n_packs": n_packs,
        "n_seqs": n_seqs,
        "total_tokens": total_tokens,
        "fill": total_tokens / (n_packs * context_len) if n_packs else 0.0,
    }


def _histogram_partial(vocab_size: int, tokens_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        tokens = batch[tokens_col]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        # flatten(), not .values: a sliced block's .values would count
        # tokens belonging to OTHER slices of the same parent array
        flat = tokens.flatten().to_numpy(zero_copy_only=False)
        # ids outside [0, vocab_size) would crash bincount (negative) or
        # return a longer array that breaks the driver merge — drop them
        flat = flat[(flat >= 0) & (flat < vocab_size)]
        counts = np.bincount(flat, minlength=vocab_size).astype(np.int64)
        hist = pa.ListArray.from_arrays(
            pa.array([0, vocab_size], pa.int32()), pa.array(counts, pa.int64())
        )
        return pa.table({"hist": hist})

    return fn


def token_histogram(
    ds,
    vocab_size: int = VOCAB_SIZE,
    tokens_col: str = "tokens",
    reduce_width: int = 8,
    merge_batch: int = 64,
) -> np.ndarray:
    """Corpus token-id frequency vector — one bincount per block, merged
    through a TREE before the driver (VERDICT r3 item 7: the round-3
    driver loop summed one 400 KB partial PER BLOCK — 400 GB through one
    process at 10^6 blocks).

    Reduce shape: a first merge level FUSES into the partial stage
    (``batch_size=merge_batch`` collapses ``merge_batch`` partials per
    task, no shuffle), one ``repartition(reduce_width)`` moves the
    surviving rows, a second merge level collapses per partition, and the
    driver sums at most ~max(reduce_width, blocks/merge_batch²) arrays."""
    partials = ds.map_batches(
        _histogram_partial(vocab_size, tokens_col),
        batch_format="pyarrow",
        batch_size=None,
    )

    def merge(batch: pa.Table) -> pa.Table:
        hl = batch["hist"].combine_chunks()
        flat = np.asarray(hl.flatten())
        s = flat.reshape(-1, vocab_size).sum(axis=0)
        return pa.table(
            {
                "hist": pa.ListArray.from_arrays(
                    pa.array([0, vocab_size], pa.int32()),
                    pa.array(s, pa.int64()),
                )
            }
        )

    merged = (
        partials.map_batches(merge, batch_format="pyarrow",
                             batch_size=merge_batch)
        .repartition(reduce_width)
        .map_batches(merge, batch_format="pyarrow", batch_size=merge_batch)
    )
    total = np.zeros(vocab_size, dtype=np.int64)
    for b in merged.iter_batches(batch_format="pyarrow"):
        hl = b["hist"].combine_chunks()
        flat = np.asarray(hl.flatten())
        total += flat.reshape(-1, vocab_size).sum(axis=0)
    return total


def _sequence_hash128(tokens: "pa.ListArray") -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit polynomial hashes over each row's
    token values + length → a 128-bit content identity per sequence.

    Flat O(total-tokens) evaluation, no per-row or per-depth loop: hash =
    Σ f(vᵢ)·p^(end−1−i) (mod 2⁶⁴) — the exponent of every flat position is
    its distance from its row's END, so one precomputed power table + one
    gather + one ``np.add.reduceat`` evaluates every row at once.  The two
    hashes use distinct odd primes and distinct value injections (v+1 and
    v ⊕ golden) for independence.  Tokens never leave Arrow buffers."""
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    # flatten(), not .values: offsets are normalized to zero above, and on a
    # sliced ListArray .values is the FULL unsliced child (ADVICE r4) —
    # flatten() is the matching sliced buffer (zero-copy for non-null lists).
    flat = np.asarray(tokens.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.uint64)
    n = len(tokens)
    lens = np.diff(offsets).astype(np.uint64)
    p1 = np.uint64(1099511628211)
    p2 = np.uint64(0x9E3779B97F4A7C15 | 1)
    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    if flat.size:
        from log_formatter_ray.ops._chunk import row_chunks

        # per row-aligned cache-resident chunk (~6 working arrays — see
        # ops/_chunk.py); per-row sums are chunk-size-independent
        cut = row_chunks(offsets)
        for c0, c1 in zip(cut[:-1], cut[1:]):
            s0, s1 = int(offsets[c0]), int(offsets[c1])
            if s1 == s0:
                continue
            o = offsets[c0:c1 + 1] - s0
            fl = flat[s0:s1]
            lens_c = np.diff(o)
            max_len = int(lens_c.max())
            # wraparound power tables p^0..p^(max_len-1)
            pow1 = np.empty(max_len, np.uint64)
            pow2 = np.empty(max_len, np.uint64)
            pow1[0] = pow2[0] = 1
            if max_len > 1:
                np.multiply.accumulate(np.full(max_len - 1, p1),
                                       out=pow1[1:])
                np.multiply.accumulate(np.full(max_len - 1, p2),
                                       out=pow2[1:])
            # exponent of flat position i = (its row's end − 1 − i)
            e = (
                np.repeat(o[1:], lens_c) - 1
                - np.arange(fl.size, dtype=np.int64)
            )
            ne = o[:-1] < o[1:]
            starts = o[:-1][ne]
            t1 = (fl + np.uint64(1)) * pow1[e]
            t2 = (fl ^ np.uint64(0x9E3779B97F4A7C15)) * pow2[e]
            rows_ne = np.arange(int(c0), int(c1))[ne]
            h1[rows_ne] = np.add.reduceat(t1, starts)
            h2[rows_ne] = np.add.reduceat(t2, starts)
    h1 = h1 * p1 + lens
    h2 = (h2 ^ lens) * p2
    return h1, h2


def dedup_sequences(ds, tokens_col: str = "tokens", id_col: str = "doc_id",
                    coarse: int = 256, broadcast_limit: int = 5_000_000):
    """Keep the min-``id_col`` row per distinct TOKEN SEQUENCE — exact
    dedup of a pretokenized corpus, byte-exact on the tokens payload
    (pyarrow end to end, never pandas).

    Identity is a 128-bit double polynomial hash of (values, length)
    (:func:`_sequence_hash128` — collision odds ~2⁻¹²⁸, far below any
    corpus size).  The TOKEN PAYLOAD NEVER SHUFFLES: only (h1, h2, id)
    rows — ~24 B + id per sequence — go through the coarse h1-partitioned
    groupby that elects each distinct sequence's min-id keeper; the
    non-keeper ids come back as a drop filter (broadcast while the drop
    set fits a worker, hash-partitioned anti-join above
    ``broadcast_limit`` — the ``dedup_by_clusters`` plan pair)."""
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    def hash_only(batch: pa.Table) -> pa.Table:
        toks = batch[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        h1, h2 = _sequence_hash128(toks)
        return pa.table(
            {
                id_col: batch[id_col],
                "_h1": pa.array(h1.astype(np.int64)),
                "_h2": pa.array(h2.astype(np.int64)),
                "_part": pa.array((h1 % np.uint64(coarse)).astype(np.int32)),
            }
        )

    hashed = ds.map_batches(
        hash_only, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )

    def drop_ids(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("_h1", "ascending"), ("_h2", "ascending"),
                              (id_col, "ascending")]
        )
        g = group.take(order)
        a = g["_h1"].to_numpy(zero_copy_only=False)
        b = g["_h2"].to_numpy(zero_copy_only=False)
        dup = np.zeros(len(g), bool)
        dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
        return g.filter(pa.array(dup)).select([id_col])

    drops = hashed.groupby("_part").map_groups(
        drop_ids, batch_format="pyarrow"
    ).materialize()
    n_drop = drops.count()
    if not n_drop:
        return ds

    if n_drop <= broadcast_limit:
        drop_arr = pa.concat_arrays(
            [b[id_col].combine_chunks()
             for b in drops.iter_batches(batch_format="pyarrow")]
        )
        drop_ref = ray.put(drop_arr)

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(
                    pc.is_in(batch[id_col], value_set=ray.get(drop_ref))
                )
            )

        return ds.map_batches(
            keep, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )

    # huge drop set: hash-partitioned anti-join (corpus shuffles once)
    from log_formatter_ray.ops.dedup import partitioned_anti_join

    return partitioned_anti_join(
        ds, drops, id_col=id_col, drop_id_col=id_col, coarse=coarse
    )


# span-corruption chunk size (tokens): the kernel makes ~15 full-length
# passes (PRN avalanche, span deltas, run scans, event sort) with a ~40
# B/token working set — chunking rows so that set stays cache-resident
# applies the MinHash lesson (see ops/dedup._SIG_CHUNK).  The kernel is
# slice-invariant by construction (PRN = f(hash(doc_id), pos_in_row)),
# so chunk outputs concatenate byte-identically (pinned by test).
_SPAN_CHUNK = 1 << 16


def span_corrupt_sequences(
    batch: pa.Table,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    noise_density: float = 0.15,
    mean_span: int = 3,
    sentinel_base: int = VOCAB_SIZE - 1,
    seed: int = 42,
) -> pa.Table:
    """T5-style span corruption — row-chunked driver around
    :func:`_span_corrupt_block` (the full semantics doc); each chunk's
    ~15 flat passes run over a cache-resident slice instead of the whole
    block."""
    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
        batch = batch.set_column(
            batch.schema.get_field_index(tokens_col), tokens_col, tokens
        )
    off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vol = off - off[0]
    n = len(batch)
    kw = dict(tokens_col=tokens_col, id_col=id_col,
              noise_density=noise_density, mean_span=mean_span,
              sentinel_base=sentinel_base, seed=seed)
    if int(vol[-1]) <= 2 * _SPAN_CHUNK:
        return _span_corrupt_block(batch, **kw)
    marks = np.arange(_SPAN_CHUNK, int(vol[-1]), _SPAN_CHUNK)
    cut = np.unique(np.concatenate(
        ([0], np.searchsorted(vol, marks, side="left"), [n])
    )).astype(np.int64)
    parts = [
        _span_corrupt_block(batch.slice(int(c0), int(c1 - c0)), **kw)
        for c0, c1 in zip(cut[:-1], cut[1:]) if c1 > c0
    ]
    return pa.concat_tables(parts)


def _span_corrupt_block(
    batch: pa.Table,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    noise_density: float = 0.15,
    mean_span: int = 3,
    sentinel_base: int = VOCAB_SIZE - 1,
    seed: int = 42,
) -> pa.Table:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): mask
    ~``noise_density`` of each row's tokens in spans of mean length
    ``mean_span``; ``inputs`` replaces each masked span with one
    descending sentinel id (``sentinel_base - k``), ``targets`` is the
    concatenation of ``[sentinel_k, span_k tokens...]`` runs plus a
    closing sentinel — the standard encoder-decoder denoising pair.

    Fully vectorized AND deterministic: span starts/lengths come from a
    splitmix of ``hash(doc_id)`` and the token position — never a batch
    RNG — so outputs are identical under any block layout or slice
    (pinned by test).  Spans never cross row boundaries (lengths clip at
    the row end).  One flat pass; no shuffle; rows needing more
    sentinels than the vocab reserves are the caller's contract
    (sentinel ids simply keep descending).

    Output: (id_col, inputs: list<int32>, targets: list<int32>).
    """
    from log_formatter_ray.ops.dedup import _stable_hash64

    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    n = len(off) - 1
    total = int(off[-1])
    counts = np.diff(off)

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()

    # per-position PRN in UINT32: numpy's uint64 multiply has no SIMD
    # path (measured 15-25× slower than uint32 on this exact pass), and
    # this is the op's hottest loop.  pos_in_row = global_idx - row_start
    # folds into a per-row constant (mod-2^32 wraparound is part of the
    # identity), so the position array is never built and the stream is
    # one repeat + one arange-multiply + an xxhash-style avalanche —
    # still a pure function of (hash(doc_id), pos_in_row, seed):
    # layout/slice-invariant, pinned by test.
    r = _stable_hash64(ids.to_numpy(zero_copy_only=False))
    r32 = ((r >> np.uint64(32)) ^ r).astype(np.uint32)
    G32 = np.uint32(2654435761)
    per_row = r32 + (
        np.uint32(1 + seed) - off[:-1].astype(np.uint32)
    ) * G32
    h = np.repeat(per_row, counts) + np.arange(total, dtype=np.uint32) * G32
    h ^= h >> np.uint32(16)
    h *= np.uint32(2246822519)
    h ^= h >> np.uint32(13)

    p_start = noise_density / mean_span
    is_start = h < np.uint32(int(p_start * (1 << 32)))

    # union of spans via +1/-1 deltas cumsummed along the flat stream;
    # the -1 lands at min(start+len, row_end) so spans clip at row ends.
    # span lengths only materialize AT start positions (sparse) from a
    # second avalanche round so they are independent of the start bits
    starts = np.flatnonzero(is_start)
    hs = h[starts] * np.uint32(3266489917)
    hs ^= hs >> np.uint32(15)
    span_len = 1 + (hs % np.uint32(2 * mean_span - 1)).astype(np.int64)
    row_end = np.repeat(off[1:], counts)
    ends = np.minimum(starts + span_len, row_end[starts])
    delta = np.bincount(starts, minlength=total + 1) - np.bincount(
        ends, minlength=total + 1
    )
    masked = np.cumsum(delta[:-1]) > 0

    # run starts (row-aware): masked with no masked predecessor in-row
    prev = np.zeros(total, bool)
    prev[1:] = masked[:-1]
    is_row_start = np.zeros(total, bool)
    is_row_start[off[:-1][counts > 0]] = True
    run_start = masked & (~prev | is_row_start)

    # per-row run ordinal k (0-based) at each run start
    rs_cum = np.cumsum(run_start)
    row_runs = np.add.reduceat(
        run_start.astype(np.int64), off[:-1][counts > 0]
    ) if total else np.zeros(0, np.int64)
    runs_per_row = np.zeros(n, np.int64)
    runs_per_row[counts > 0] = row_runs
    runs_before = np.cumsum(runs_per_row) - runs_per_row
    k = (rs_cum - 1) - np.repeat(runs_before, counts)  # valid at run starts
    sentinel = (sentinel_base - k).astype(np.int64)

    # ---- inputs: unmasked tokens, sentinels at run starts ----
    keep = ~masked | run_start
    in_vals = np.where(run_start, sentinel, flat.astype(np.int64))[keep]
    in_off = np.zeros(n + 1, np.int64)
    np.cumsum(_per_row_counts(keep, off), out=in_off[1:])

    # ---- targets: [sentinel_k, span_k...] runs + closing sentinel ----
    # event keys order everything in one sort-free pass: run-start
    # sentinel at p*4, masked token at p*4+1, closing sentinel at
    # (row_end-1)*4+3 (after every in-row event, before the next row's)
    n_masked_row = _per_row_counts(masked, off)
    has_runs = runs_per_row > 0
    tgt_counts = n_masked_row + runs_per_row + has_runs.astype(np.int64)
    tgt_off = np.zeros(n + 1, np.int64)
    np.cumsum(tgt_counts, out=tgt_off[1:])
    keys = np.concatenate([
        np.flatnonzero(run_start) * 4,
        np.flatnonzero(masked) * 4 + 1,
        (off[1:][has_runs] - 1) * 4 + 3,
    ])
    vals = np.concatenate([
        sentinel[run_start],
        flat.astype(np.int64)[masked],
        (sentinel_base - runs_per_row[has_runs]),
    ])
    order = np.argsort(keys, kind="stable")
    tgt_vals = vals[order]

    def _list(values: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
        return pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), pa.int32()),
            pa.array(values.astype(np.int32), pa.int32()),
        )

    return pa.table({
        id_col: ids,
        "inputs": _list(in_vals, in_off),
        "targets": _list(tgt_vals, tgt_off),
    })


def _per_row_counts(mask: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Per-row True counts of a flat boolean mask (reduceat, empty-row
    safe)."""
    n = len(off) - 1
    out = np.zeros(n, np.int64)
    nonempty = off[:-1] < off[1:]
    if mask.size and nonempty.any():
        out[nonempty] = np.add.reduceat(
            mask.astype(np.int64), off[:-1][nonempty]
        )
    return out


def remap_tokens(
    batch: pa.Table,
    lut: np.ndarray,
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> pa.Table:
    """Translate every token id through a lookup table (``new_id =
    lut[old_id]``) — tokenizer migration / vocab pruning / id
    compaction.  One numpy gather over the flat value buffer per batch;
    offsets are reused as-is (zero-copy list structure).  The LUT is a
    plain int32 array the caller broadcasts once via ``ray.put`` in an
    actor/closure — never rebuild it per batch.

    Out-of-range ids raise (a LUT must cover the vocab; map unknowns to
    an UNK id explicitly in the table)."""
    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    if flat.size and (flat.max() >= len(lut) or flat.min() < 0):
        raise ValueError(
            f"token id outside LUT range [0, {len(lut)}): "
            f"[{flat.min()}, {flat.max()}]"
        )
    mapped = pa.ListArray.from_arrays(
        pa.array(off.astype(np.int32), pa.int32()),
        pa.array(np.asarray(lut, np.int32)[flat], pa.int32()),
    )
    name = out_col or tokens_col
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, mapped)


def bpe_pair_counts(ds, tokens_col: str = "tokens", k: int = 20,
                    coarse: int = 128, key_space: int = 1 << 17):
    """Top-``k`` adjacent token-id pairs across the corpus — the merge
    candidate selection at the heart of BPE training (one round), and a
    bigram-statistics primitive in its own right.

    Plan: per block, pairs fold into a single int64 key
    (``a*key_space + b`` — loud guard if ids don't fit), one
    ``np.unique`` partial per block (pairs never cross row boundaries),
    then a coarse hash(key) shuffle of the (key, n) partials.  A pair's
    total count lives entirely in one partition, so per-partition
    top-``k`` followed by a global top-``k`` over ≤ coarse×k survivors
    is exact.  Output (a, b, n) ordered by (n desc, a, b)."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table) -> pa.Table:
        toks = batch[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        if flat.size and flat.max() >= key_space:
            raise ValueError(f"token id >= key_space={key_space}")
        if flat.size < 2:
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int32())})
        key = flat[:-1] * key_space + flat[1:]
        valid = np.ones(key.size, dtype=bool)
        cross = off[1:-1] - 1
        cross = cross[(cross >= 0) & (cross < key.size)]
        valid[cross] = False
        u, c = np.unique(key[valid], return_counts=True)
        return pa.table({
            "key": pa.array(u),
            "n": pa.array(c.astype(np.int64)),
            "part": pa.array(
                (u.astype(np.uint64) % np.uint64(coarse)).astype(np.int32)
            ),
        })

    def topk_part(group: pa.Table) -> pa.Table:
        keys = group["key"].to_numpy(zero_copy_only=False)
        ns = group["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ks, vs = keys[order], ns[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        totals = np.add.reduceat(vs, starts)
        uk = ks[starts]
        top = np.lexsort((uk, -totals))[:k]
        return pa.table({
            "a": pa.array(uk[top] // key_space),
            "b": pa.array(uk[top] % key_space),
            "n": pa.array(totals[top]),
        })

    return (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(topk_part, batch_format="pyarrow")
        .sort(["n", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


def add_pack_masks(
    batch: pa.Table,
    context_len: int = 2048,
    pad_id: int = 0,
) -> pa.Table:
    """Turn packed contexts (:func:`pack_sequences` output) into
    model-ready fixed-length arrays: right-padded ``input_ids``
    (``fixed_size_list<int32>[context_len]``), a per-token ``doc_index``
    (which member sequence each position belongs to; ``-1`` on padding
    — the standard block-diagonal attention mask key for packed
    training), and ``loss_mask`` (1 on real tokens, 0 on padding).

    Vectorized from the ``boundaries`` column alone: one ``np.repeat``
    over boundary run lengths per batch, one buffer fill — no per-row
    Python.  Output rows stay aligned with the input packs."""
    toks = batch["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    n = len(batch)
    counts = np.diff(off)
    if np.any(counts > context_len):
        raise ValueError("a pack exceeds context_len; re-pack first")

    bounds = batch["boundaries"]
    if isinstance(bounds, pa.ChunkedArray):
        bounds = bounds.combine_chunks()
    b_off = bounds.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    b_off = b_off - b_off[0]
    b_flat = bounds.flatten().to_numpy(zero_copy_only=False).astype(np.int64)

    ids = np.full(n * context_len, pad_id, dtype=np.int32)
    doc_index = np.full(n * context_len, -1, dtype=np.int32)
    # member run lengths: boundaries are cumulative WITHIN each pack
    prev = np.roll(b_flat, 1)
    prev[b_off[:-1]] = 0  # first boundary of each pack starts at 0
    run_lens = b_flat - prev
    member_ord = (
        np.arange(b_flat.size, dtype=np.int64)
        - np.repeat(b_off[:-1], np.diff(b_off))
    )
    # destination of each real token in the padded matrix
    row_of_tok = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos_in_row = np.arange(int(off[-1]), dtype=np.int64) - np.repeat(
        off[:-1], counts
    )
    dest = row_of_tok * context_len + pos_in_row
    ids[dest] = flat
    doc_index[dest] = np.repeat(member_ord, run_lens).astype(np.int32)

    def _fsl(values: np.ndarray, typ) -> pa.FixedSizeListArray:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(values, typ), context_len
        )

    batch = batch.append_column("input_ids", _fsl(ids, pa.int32()))
    batch = batch.append_column("doc_index", _fsl(doc_index, pa.int32()))
    return batch.append_column(
        "loss_mask", _fsl((doc_index >= 0).astype(np.int8), pa.int8())
    )


def fim_transform(
    batch: pa.Table,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    fim_rate: float = 0.5,
    pre_id: int = VOCAB_SIZE - 3,
    suf_id: int = VOCAB_SIZE - 2,
    mid_id: int = VOCAB_SIZE - 1,
    seed: int = 42,
) -> pa.Table:
    """Fill-in-the-middle transform (Bavarian et al. 2022, PSM mode):
    with probability ``fim_rate`` per row, pick two hash-derived cut
    points and emit ``[PRE] prefix [SUF] suffix [MID] middle`` (the
    model learns to infill); other rows pass through unchanged.

    Deterministic and layout/slice-invariant: the apply decision and
    both cuts derive from an avalanche of ``hash(doc_id)`` and ``seed``
    — never a batch RNG.  Fully vectorized: rows expand into an ordered
    segment list (≤ 6 segments each) and ONE arange-difference gather
    assembles the output; sentinel positions are scattered afterwards.

    Output: (id_col, tokens, fim_applied: bool).  Transformed rows grow
    by exactly 3 sentinel tokens; round-trip inversion is pinned by
    test."""
    from log_formatter_ray.ops.dedup import _stable_hash64

    tokens = batch[tokens_col]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    off = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    n = len(batch)
    L = np.diff(off)

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    r = _stable_hash64(ids.to_numpy(zero_copy_only=False))
    h = (r + np.uint64(seed)).astype(np.uint64)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(29)
    apply_row = ((h & np.uint64(0xFFFFFFFF)) <
                 np.uint64(int(fim_rate * (1 << 32)))) & (L > 0)
    u = ((h >> np.uint64(32)) % np.uint64(1 << 16)).astype(np.float64)
    v = ((h >> np.uint64(48)) % np.uint64(1 << 16)).astype(np.float64)
    c1 = np.minimum((u / (1 << 16) * (L + 1)).astype(np.int64), L)
    c2 = np.minimum((v / (1 << 16) * (L + 1)).astype(np.int64), L)
    c1, c2 = np.minimum(c1, c2), np.maximum(c1, c2)

    # ordered segment list per row: applied rows -> 6 segments
    # ([PRE], prefix, [SUF], suffix, [MID], middle), plain rows -> 1.
    # sentinel segments carry src < 0 (filled by value afterwards)
    seg_rows, seg_src, seg_len = [], [], []
    a = apply_row
    p = ~apply_row
    # build column-wise then interleave by ordering key (row, slot)
    slots = [
        (a, np.full(n, -1), np.ones(n, np.int64)),            # [PRE]
        (a, off[:-1], c1),                                     # prefix
        (a, np.full(n, -2), np.ones(n, np.int64)),            # [SUF]
        (a, off[:-1] + c2, L - c2),                            # suffix
        (a, np.full(n, -3), np.ones(n, np.int64)),            # [MID]
        (a, off[:-1] + c1, c2 - c1),                           # middle
    ]
    order_key, srcs, lens = [], [], []
    for slot_no, (mask, src, ln) in enumerate(slots):
        rows = np.flatnonzero(mask)
        order_key.append(rows * 8 + slot_no)
        srcs.append(np.asarray(src)[rows])
        lens.append(np.asarray(ln)[rows])
    rows_p = np.flatnonzero(p)
    order_key.append(rows_p * 8 + 7)
    srcs.append(off[:-1][rows_p])
    lens.append(L[rows_p])
    order_key = np.concatenate(order_key)
    srcs = np.concatenate(srcs)
    lens = np.concatenate(lens)
    srt = np.argsort(order_key, kind="stable")
    seg_row = order_key[srt] // 8
    srcs, lens = srcs[srt], lens[srt]

    out_lens = L + np.where(apply_row, 3, 0)
    new_off = np.zeros(n + 1, np.int64)
    np.cumsum(out_lens, out=new_off[1:])
    total_out = int(new_off[-1])

    # one gather: output position -> source index (sentinels < 0)
    seg_out = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=seg_out[1:])
    pos = np.arange(total_out, dtype=np.int64)
    rep = np.repeat(np.arange(len(lens)), lens)
    local = pos - np.repeat(seg_out[:-1], lens)
    src_idx = srcs[rep] + np.where(srcs[rep] >= 0, local, 0)
    vals = np.empty(total_out, dtype=np.int32)
    tok_mask = src_idx >= 0
    vals[tok_mask] = flat[src_idx[tok_mask]]
    vals[src_idx == -1] = pre_id
    vals[src_idx == -2] = suf_id
    vals[src_idx == -3] = mid_id

    return pa.table({
        id_col: ids,
        "tokens": pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), pa.int32()),
            pa.array(vals, pa.int32()),
        ),
        "fim_applied": pa.array(apply_row),
    })
