"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the part that must survive 100 TB):

* **Exact** — hash first (64-bit content hash per batch, vectorized), then a
  single hash-partitioned ``groupby`` over the HASH (uniform by
  construction, no text-key skew), keep min-id per distinct content inside
  each group.  The only shuffle moves (hash, id, text) — not the token
  payload.
* **MinHash+LSH** — signatures per batch in an actor pool (hash matrices
  built once per actor), band-explode to (id, bucket_key, sig) rows, and
  ``groupby`` COARSE bucket partitions (``bucket_key % coarse``), never the
  corpus.  Within a coarse partition, equal-key runs are found vectorized
  and only multi-member buckets pay any per-bucket work; candidate pairs
  estimate Jaccard from signature agreement *inside the bucket* (the
  signatures travel with the band rows — no driver-side signature map), and
  the passing edges feed a distributed connected-components
  (``ops/graph.py``) whose result is a Dataset.  The driver holds nothing
  per-document.  Degenerate buckets are truncated at ``max_bucket`` with a
  logged count.
* **SimHash** — 64-bit signature per doc (vectorized batch-level votes);
  candidates from 4×16-bit band buckets (any pair within Hamming ≤3 shares
  ≥1 exact 16-bit band by pigeonhole), same coarse-partition + capped-bucket
  pairing, Dataset output.
* **Embedding** — multi-band random-hyperplane LSH (OR-construction across
  ``bands`` independent hyperplane sets raises recall; ``nbits`` per band
  keeps buckets small), capped buckets, blocked cosine inside each bucket,
  Dataset output deduplicated across bands.

Choosing ``coarse``: each coarse partition costs a fixed ~1–5 ms of
per-group machinery on top of the vectorized work (measured — 4096
partitions added ~3 s to a 50k-doc SimHash run that does <2 s of real
work; a 100k-row range join dropped 4.8 → 1.0 s going 1024 → 256), so
defaults are small (256 for keyed ops, 1024 for band-exploded LSH);
RAISE with corpus size so a partition (≈ rows×bands/coarse) stays
inside a worker — at 10^12 docs think 10^5–10^6, where the fixed cost
is noise.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from log_formatter_ray.ops.graph import connected_components

logger = logging.getLogger("log_formatter_ray")

_MERSENNE31 = np.uint64((1 << 31) - 1)

# MinHash permutation-loop chunk size (shingles): keeps the (h, tmp, red)
# uint64 working set (~3 × 8 B × chunk) inside L2 across all num_perm
# passes, so DRAM reads the shingle buffer ~once per block instead of once
# per permutation.  Row-aligned; byte-identical signatures at any value.
_SIG_CHUNK = 1 << 15
_FNV_PRIME = np.uint64(1099511628211)
_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def _stable_hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit string hash (pandas siphash with the
    fixed default key — stable across processes and runs)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def _split_word_hashes(text) -> tuple[np.ndarray, np.ndarray]:
    """Python ``str.split()``-semantics word hashes for a string column:
    one Arrow UNICODE-whitespace split + ONE ``hash_array`` per batch.

    Returns ``(h, offsets)``: ``h`` is the flat uint64 hash array of every
    row's (non-empty) words in row order; ``offsets`` (len nrows+1)
    delimits each row's slice.  Nulls hash as empty rows.
    """
    from log_formatter_ray.ops.textstats import _per_row_sum

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    text = pc.fill_null(text, "")
    # utf8_split_whitespace splits on UNICODE whitespace — the exact
    # semantics of Python str.split(); an RE2 \s+ split would miss
    # U+00A0 etc. and silently change hashes
    words = pc.utf8_split_whitespace(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    flat = words.flatten()
    # the split leaves empty strings at leading/trailing whitespace —
    # str.split() (the semantic contract) drops them
    keep = np.asarray(
        pc.not_equal(flat, "").to_numpy(zero_copy_only=False), dtype=bool
    )
    kept_per_row = _per_row_sum(keep.astype(np.int64), offsets)
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_per_row, out=new_offsets[1:])
    words_np = flat.to_numpy(zero_copy_only=False)[keep]
    if not words_np.size:
        return np.empty(0, np.uint64), new_offsets
    return _stable_hash64(words_np), new_offsets


def _token_value_hashes(tokens) -> tuple[np.ndarray, np.ndarray]:
    """Token-id "word" hashes for a ``list<int>`` column — the tokens-axis
    analog of :func:`_split_word_hashes` (same ``(h, offsets)`` layout, so
    :func:`_shingle_hashes` and :class:`MinHasher` compose unchanged).
    Each token mixes through a golden-ratio multiply; ``flatten()`` keeps
    sliced ListArrays correct."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    flat = np.asarray(tokens.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.uint64)
    return (flat + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15), offsets


def _shingle_hashes(
    h: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row word-``k``-gram shingle hashes as a polynomial fold (mod
    2^64) of ``k`` consecutive word hashes — the vectorized replacement for
    per-row ``" ".join`` string shingles (VERDICT r3 item 3): no string
    construction, no per-row Python.  A row with ``0 < nw < k`` words
    emits ONE shingle folding all its word hashes (the historical
    ``" ".join(words)`` single-shingle semantics); empty rows emit none.

    Returns ``(shingles, out_offsets)`` in the flat-values/offsets layout.
    Duplicate shingles within a row are NOT deduplicated — min over
    duplicates equals min over the set, so MinHash is unaffected; Jaccard
    callers apply their own per-row ``np.unique``.
    """
    n = len(offsets) - 1
    nw = np.diff(offsets)
    counts = np.where(nw >= k, nw - k + 1, (nw > 0).astype(np.int64))
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=out_off[1:])
    out = np.empty(int(out_off[-1]), np.uint64)
    if not out.size:
        return out, out_off
    # full-size windows: ONE global sliding fold over the flat hash array,
    # then gather the starts that do not cross a row boundary
    long_rows = nw >= k
    if long_rows.any():
        W = h.size - k + 1
        powers = _FNV_PRIME ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        # shifted CONTIGUOUS slices beat a sliding_window_view multiply
        # (strided gathers) ~3× at multi-M shingle counts
        fold = np.zeros(W, np.uint64)
        tmp = np.empty(W, np.uint64)
        for j in range(k):
            np.multiply(h[j:j + W], powers[j], out=tmp)
            fold += tmp
        reps = np.where(long_rows, counts, 0)
        base = np.repeat(offsets[:-1], reps)
        csum = np.zeros(n, np.int64)
        np.cumsum(reps[:-1], out=csum[1:])
        intra = np.arange(int(reps.sum())) - np.repeat(csum, reps)
        dest = np.repeat(out_off[:-1], reps) + intra
        out[dest] = fold[base + intra]
    # short rows (one shingle over all nw < k words): at most k-1 distinct
    # lengths, each handled in one vectorized pass
    for w in range(1, k):
        rows = np.flatnonzero(nw == w)
        if not rows.size:
            continue
        powers_w = _FNV_PRIME ** np.arange(w - 1, -1, -1, dtype=np.uint64)
        idx = offsets[:-1][rows]
        acc = np.zeros(rows.size, np.uint64)
        for j in range(w):
            acc += h[idx + j] * powers_w[j]
        out[out_off[:-1][rows]] = acc
    return out, out_off


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                coarse: int = 256, mode: str = "safe",
                broadcast_limit: int = 5_000_000):
    """Keep the min-``id_col`` row per distinct ``text_col`` value.

    ``mode="safe"`` (default, the oracle-gate plan) is hash-COLLISION-safe:
    the shuffle key is a COARSE partition of the 64-bit content hash
    (uniform by construction, no text-key skew), and the keeper is chosen
    per *actual* content: one vectorized sort + drop_duplicates over each
    partition (``drop_duplicates`` keeps the WHOLE min-id row — a
    per-column ``.first()`` would splice fields from dropped duplicates).
    Every row — document text included — rides the shuffle once.

    ``mode="light"`` keeps the DOCUMENT PAYLOAD out of the shuffle: only
    (h1, h2, id) rows elect keepers per 128-bit double-hash identity
    (collision odds ~2⁻¹²⁸ — astronomically below any corpus), and the
    non-keeper ids come back as a broadcast drop filter (or a
    hash-partitioned anti-join above ``broadcast_limit``).  The at-100-TB
    plan: shuffle bytes drop from the corpus to ~24 B + id per row.

    Null texts dedupe to one kept row, matching SQL ``GROUP BY text``
    (which groups NULLs together).
    """
    if mode == "light":
        return _exact_dedup_light(ds, text_col, id_col, coarse,
                                  broadcast_limit)

    def add_keys(batch: pa.Table) -> pa.Table:
        vals = batch[text_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = _stable_hash64(vals)
        batch = batch.append_column("_h", pa.array(h.astype(np.int64)))
        return batch.append_column(
            "_part", pa.array((h % np.uint64(coarse)).astype(np.int32))
        )

    hashed = ds.map_batches(
        add_keys, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["_h", text_col, id_col]).drop_duplicates(
            ["_h", text_col]
        )

    out = hashed.groupby("_part").map_groups(keep_first, batch_format="pandas")
    return out.drop_columns(["_h", "_part"])


def _exact_dedup_light(ds, text_col: str, id_col: str, coarse: int,
                       broadcast_limit: int):
    """The payload-light exact-dedup plan (see :func:`exact_dedup`)."""
    import ray.data as rd  # noqa: F401  (plan helpers)

    def hash_only(batch: pa.Table) -> pa.Table:
        vals = batch[text_col].combine_chunks().to_numpy(zero_copy_only=False)
        h1 = _stable_hash64(vals)
        # genuinely independent second hash: siphash under a DIFFERENT
        # 16-byte key (a second pass over the content, not a function of
        # h1 — that would leave collision odds at 2^-64)
        h2 = pd.util.hash_array(
            np.asarray(vals, dtype=object), categorize=False,
            hash_key="lfr-second-hash!",
        ).astype(np.uint64)
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
    if not drops.count():
        return ds
    if drops.count() <= broadcast_limit:
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
    return partitioned_anti_join(
        ds, drops, id_col=id_col, drop_id_col=id_col, coarse=coarse
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: per-row word-shingle MinHash signatures.

    The permutation matrices (a, b) are built ONCE per actor from ``seed``
    (the per-worker compiled-state pattern of the reference,
    /root/reference/agent/pipeline/pipeline.go:81-98).
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        shingle_k: int = 3,
        seed: int = 42,
    ):
        rng = np.random.default_rng(seed)
        # 31-bit permutation space: a*h+b < 2^62 stays exact in uint64
        # (a 61-bit modulus would silently overflow the multiply).
        self.a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.shingle_k
        n_rows = len(batch)
        # Shingle hashes with NO string construction and no per-row Python:
        # Arrow whitespace split + hash_array over flat words, then a
        # rolling polynomial fold of k consecutive word hashes (duplicates
        # within a row are harmless — min over duplicates equals min over
        # the set).  The WHOLE hash → shingle → permute pipeline runs per
        # row-aligned CACHE-RESIDENT chunk — three prior forms lost to the
        # memory bus: the (num_perm × S) matrix paid ~11× (uint64 `%` is
        # an integer DIVISION per element; 512 MB per 1M shingles); flat
        # (S,) per-perm buffers re-streamed ~3 S-sized uint64 arrays from
        # DRAM for EVERY permutation (~46 GB per 4.5M-shingle block); and
        # chunking only the permutation loop left the hash/shingle phase
        # as a full-block multi-pass DRAM streamer (~50 B/token of
        # traffic, the dominant remainder once the perm loop went L2).
        # Fused, DRAM touches the input ~once per block.  The modulus is
        # a branch-free two-fold Mersenne-31 reduction (2^31 ≡ 1 mod M,
        # valid for x < 2^62 = max(a*h+b)); per-row minima — hence
        # signatures — are byte-identical at ANY chunk size because
        # chunks split only at row boundaries (oversize single rows form
        # their own chunk; parity pinned by tests).
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        token_mode = pa.types.is_list(col.type) \
            or pa.types.is_large_list(col.type)
        if token_mode:
            # tokens-axis input: shingle over token ids directly (no text
            # round-trip; the signature/LSH/CC plan downstream is shared)
            off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vol = off - off[0]
            chunk_vol = _SIG_CHUNK
        else:
            # byte volume as the word-count proxy (~6 B per word + space)
            lens = pc.binary_length(
                pc.fill_null(col, "")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            vol = np.zeros(n_rows + 1, np.int64)
            np.cumsum(lens, out=vol[1:])
            chunk_vol = _SIG_CHUNK * 6
        marks = np.arange(chunk_vol, int(vol[-1]), chunk_vol)
        cut = np.unique(np.concatenate((
            [0], np.searchsorted(vol, marks, side="left"), [n_rows]
        ))).astype(np.int64)

        M = _MERSENNE31
        sigs = np.zeros((n_rows, self.num_perm), dtype=np.uint64)
        for c0, c1 in zip(cut[:-1], cut[1:]):
            if c1 == c0:
                continue
            sub = col.slice(int(c0), int(c1 - c0))
            if token_mode:
                wh, w_off = _token_value_hashes(sub)
            else:
                wh, w_off = _split_word_hashes(sub)
            h_all, s_off = _shingle_hashes(wh, w_off, k)
            if not h_all.size:
                continue
            h = h_all % M
            row_start, row_end = s_off[:-1], s_off[1:]
            ne = row_end > row_start
            st = row_start[ne]
            rows_ne = np.arange(int(c0), int(c1))[ne]
            t = np.empty(h.size, np.uint64)
            d = np.empty(h.size, np.uint64)
            for j in range(self.num_perm):
                np.multiply(h, self.a[j], out=t)
                np.add(t, self.b[j], out=t)
                np.bitwise_and(t, M, out=d)
                np.right_shift(t, np.uint64(31), out=t)
                np.add(d, t, out=t)        # < 2^32
                np.bitwise_and(t, M, out=d)
                np.right_shift(t, np.uint64(31), out=t)
                np.add(d, t, out=t)        # <= M+1
                np.subtract(t, M, out=d)   # wraps below M
                np.minimum(t, d, out=t)    # == (a*h+b) % M
                sigs[rows_ne, j] = np.minimum.reduceat(t, st)
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": sig_list,
            }
        )


def _band_explode(num_perm: int, bands: int, id_col: str, coarse: int,
                  include_sig: bool = True):
    """(id, sig) → one row per band: (id, part, bucket_key[, sig]).

    ``bucket_key`` mixes (band, band-hash) into one int64 — a single-column
    uniform shuffle key; ``part = bucket_key % coarse`` is the groupby key so
    the shuffle sees ``coarse`` uniform partitions instead of one group per
    bucket (most buckets are singletons — per-group Python overhead at
    corpus scale would dwarf the real work).  ``include_sig=False`` emits
    the 24-byte key rows only (the light shuffle's first pass).
    """
    rows_per_band = num_perm // bands

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sigs = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        ids = batch[id_col].combine_chunks()
        # band hash: mix the r signature values of each band into one uint64
        chunks = sigs.reshape(n, bands, rows_per_band).astype(np.uint64)
        mixed = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            mixed = mixed * _FNV_PRIME + chunks[:, :, j]
        # fold the band index in so equal band-hashes in different bands
        # stay distinct buckets
        mixed ^= _GOLDEN64 * (np.arange(1, bands + 1, dtype=np.uint64))[None, :]
        keys = mixed.reshape(-1).astype(np.int64)
        rep_idx = pa.array(np.repeat(np.arange(n), bands))
        out = {
            id_col: ids.take(rep_idx),
            "part": pa.array((keys % coarse).astype(np.int32)),
            "bucket_key": pa.array(keys),
        }
        if include_sig:
            out["sig"] = batch["sig"].combine_chunks().take(rep_idx)
        return pa.table(out)

    return fn


def _run_bounds(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end indices of equal-key runs in an already-sorted key array."""
    bounds = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
    starts = np.r_[0, bounds]
    ends = np.r_[bounds, len(sorted_keys)]
    return starts, ends


def _minhash_bucket_edges(id_col: str, num_perm: int, threshold: float,
                          max_bucket: int):
    """Per coarse partition: find equal-``bucket_key`` runs, estimate
    Jaccard from signature agreement inside each multi-member bucket, emit
    passing edges (a < b).  Only multi-member buckets pay per-bucket work."""

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["bucket_key", id_col], kind="stable")
        keys = g["bucket_key"].to_numpy()
        ids = g[id_col].to_numpy()
        sig_col = g["sig"].to_numpy()
        out_a, out_b = [], []
        starts, ends = _run_bounds(keys)
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > max_bucket:
                logger.warning(
                    "minhash bucket %d truncated: %d -> %d members",
                    int(keys[s]), int(e - s), max_bucket,
                )
                e = s + max_bucket
            S = np.stack(sig_col[s:e])  # (B, num_perm)
            est = (S[:, None, :] == S[None, :, :]).mean(axis=2)
            iu, ju = np.triu_indices(e - s, k=1)
            m = est[iu, ju] >= threshold
            out_a.append(ids[s:e][iu[m]])
            out_b.append(ids[s:e][ju[m]])
        if out_a:
            return pd.DataFrame(
                {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
            )
        return pd.DataFrame({"a": ids[:0], "b": ids[:0]})

    return fn


def _candidate_filter(src, cand_ds, id_col: str, n_cand: int,
                      broadcast_limit: int, coarse: int = 256):
    """Restrict ``src`` to rows whose ``id_col`` is in ``cand_ds`` — the
    light shuffle modes' pass-B filter.  Driver broadcast below
    ``broadcast_limit`` candidate rows; hash-partitioned semi-join above
    it so a boilerplate-heavy corpus can't exhaust the driver (the
    ``exact_dedup`` broadcast/partitioned plan pair; ADVICE r4)."""
    if n_cand <= broadcast_limit:
        cand = cand_ds.to_pandas()
        want_ref = ray.put(pa.Array.from_pandas(pd.unique(cand[id_col])))
        return src.map_batches(
            lambda t: t.filter(
                pc.is_in(t[id_col], value_set=ray.get(want_ref))
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
    return partitioned_semi_join(
        src, cand_ds, id_col=id_col, key_col=id_col, coarse=coarse
    )


def minhash_lsh_clusters(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.6,
    seed: int = 42,
    concurrency=None,
    max_bucket: int = 200,
    coarse: int = 1024,
    cc_mode: str = "auto",
    shuffle_mode: str = "sigs",
    broadcast_limit: int = 5_000_000,
):
    """MinHash-LSH near-dup clustering → Dataset (id, rep) for docs in
    clusters of size ≥ 2 (rep = min id in cluster), sorted by id.

    Fully distributed: signatures travel with the band rows (≈ num_perm×8 B
    × bands per doc through the one LSH shuffle — the corpus itself never
    shuffles), Jaccard is estimated inside each bucket, and the transitive
    closure runs as distributed connected components (``ops/graph.py``);
    the driver holds no per-document state.  ``coarse`` bounds per-group
    width (rows/partition ≈ corpus×bands/coarse — raise it with corpus
    size); ``cc_mode`` picks the components plan (see
    ``connected_components``).

    ``shuffle_mode="light"`` cuts the LSH shuffle from ~num_perm×8 B ×
    bands per doc (8 KB at the defaults — several times a typical web
    document) to 24-byte key rows: pass A shuffles (id, bucket_key) only
    and finds the multi-member buckets; pass B re-runs the sig-carrying
    explode over the CANDIDATE docs alone (broadcast id set — bounded by
    the candidate count, the LSH sparsity assumption; signatures are
    materialized once and reused).  Identical edges by construction: a
    bucket's multi-member membership is decided by keys alone, and the
    per-bucket estimate/truncation in pass B sees exactly the same
    members in the same order.

    ``concurrency=None`` (default) runs the signature stage as elastic
    stateless tasks with a pre-constructed MinHasher — its per-worker state
    (two small permutation arrays) is microseconds to build, so an actor
    pool would only pay startup latency and cap the fused read→sig→explode
    chain; pass an int/tuple to force a pool when composing with genuinely
    expensive per-actor state.
    """
    hasher_kwargs = dict(
        text_col=text_col, id_col=id_col, num_perm=num_perm,
        shingle_k=shingle_k, seed=seed,
    )
    if concurrency is None:
        sigs = ds.map_batches(
            MinHasher(**hasher_kwargs),
            batch_format="pyarrow", batch_size=None,
        )
    else:
        sigs = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=hasher_kwargs,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
        )

    if shuffle_mode == "light":
        sigs = sigs.materialize()  # consumed twice: keys pass + fetch
        keys_only = sigs.map_batches(
            _band_explode(num_perm, bands, id_col, coarse, include_sig=False),
            batch_format="pyarrow", batch_size=None,
        )

        def members(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(["bucket_key", id_col], kind="stable")
            keys = g["bucket_key"].to_numpy()
            starts, ends = _run_bounds(keys)
            lens = ends - starts
            multi = np.repeat(lens >= 2, lens)
            out = g.loc[multi, [id_col]].drop_duplicates()
            return out

        cand_ds = (
            keys_only.groupby("part").map_groups(
                members, batch_format="pandas"
            )
            .map_batches(
                lambda t: pa.table(
                    {id_col: pc.unique(t[id_col].combine_chunks())}
                ),
                batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
            )
            .materialize()  # consumed twice: count + filter plan
        )
        n_cand = cand_ds.count()  # per-part-unique rows: an upper bound
        if n_cand == 0:
            import ray.data as rd

            empty = pa.table({"id": pa.nulls(0, sigs.schema().types[0]),
                              "rep": pa.nulls(0, sigs.schema().types[0])})
            return rd.from_arrow(empty)
        sub = _candidate_filter(
            sigs, cand_ds, id_col, n_cand, broadcast_limit
        )
        exploded = sub.map_batches(
            _band_explode(num_perm, bands, id_col, coarse),
            batch_format="pyarrow", batch_size=None,
        )
    else:
        exploded = sigs.map_batches(
            _band_explode(num_perm, bands, id_col, coarse),
            batch_format="pyarrow", batch_size=None,
        )
    edges = exploded.groupby("part").map_groups(
        _minhash_bucket_edges(id_col, num_perm, threshold, max_bucket),
        batch_format="pandas",
    )
    labels = connected_components(edges, mode=cc_mode)
    return labels.sort("id")


def dedup_by_clusters(
    ds,
    clusters,
    id_col: str = "doc_id",
    mode: str = "auto",
    broadcast_limit: int = 5_000_000,
    coarse: int = 256,
):
    """Drop every cluster member except its representative.  ``clusters``
    is the (id, rep) Dataset/DataFrame from ``minhash_lsh_clusters``.

    Two plans, chosen optimizer-style (the ``cc_mode`` pattern):

    * ``broadcast`` (auto at/below ``broadcast_limit`` drop ids): the drop
      set ships once via ``ray.put`` and every batch filters with one
      vectorized ``is_in`` — no shuffle at all.  Right while the drop set
      fits a worker (up to ~10^8 ids).
    * ``partitioned`` (auto above the limit): a hash-partitioned anti-join
      — corpus rows and drop ids co-partition on ``hash(id) % coarse`` in
      ONE union shuffle, and each partition filters its rows against only
      ITS drop ids (pyarrow ``map_groups``, so list columns like
      ``tokens`` never touch pandas).  Per-partition memory is
      |corpus|/coarse + |drop|/coarse — no single process ever holds the
      whole drop set, at the price of shuffling the corpus once.
    """
    import ray.data as rd

    from log_formatter_ray.ops._shuffle import PART_COL, hash_part

    if isinstance(clusters, pd.DataFrame):
        drop_df = clusters.loc[clusters["id"] != clusters["rep"], ["id"]]
        n_drop = len(drop_df)
        drop_ds = rd.from_pandas(drop_df.reset_index(drop=True)) if n_drop else None
    else:
        drop_ds = clusters.map_batches(
            lambda t: t.filter(
                pc.invert(pc.equal(t["id"], t["rep"]))
            ).select(["id"]),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).materialize()
        n_drop = drop_ds.count()
    if not n_drop:  # nothing to drop; an empty pa.array is null-typed and
        return ds   # would make pc.is_in raise against a string column

    if mode == "auto":
        mode = "broadcast" if n_drop <= broadcast_limit else "partitioned"

    if mode == "broadcast":
        if isinstance(clusters, pd.DataFrame):
            drop_arr = pa.Array.from_pandas(drop_df["id"])
        else:
            drop_arr = pa.concat_arrays(
                [b["id"].combine_chunks()
                 for b in drop_ds.iter_batches(batch_format="pyarrow")]
            )
        drop_ref = ray.put(drop_arr)

        def keep(batch: pa.Table) -> pa.Table:
            mask = pc.invert(
                pc.is_in(batch[id_col], value_set=ray.get(drop_ref))
            )
            return batch.filter(mask)

        return ds.map_batches(
            keep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    return partitioned_anti_join(
        ds, drop_ds, id_col=id_col, drop_id_col="id", coarse=coarse
    )


def elect_cluster_reps(
    clusters,
    scores,
    score_col: str,
    scores_id_col: str = "doc_id",
    coarse: int = 256,
    broadcast_limit: int = 5_000_000,
):
    """Re-elect each near-dup cluster's representative by QUALITY instead
    of min-id: the member with the highest ``score_col`` (ties → smallest
    id) becomes ``rep``.  The standard curation refinement (keep the
    longest / highest-quality duplicate, drop the rest): feed the result
    straight to :func:`dedup_by_clusters`.

    ``clusters`` is a (id, rep) Dataset (``minhash_lsh_clusters`` /
    ``connected_components`` output — only docs in clusters ≥ 2, i.e.
    sparse relative to the corpus); ``scores`` is any (id, score) Dataset
    — typically a narrow 2-column re-read of the corpus through a quality
    op.  Plan, all cluster-sized after pass A:

    A. restrict ``scores`` to cluster members (broadcast filter below
       ``broadcast_limit`` members, hash-partitioned semi-join above);
    B. co-partition members + scores on hash(id) and attach each
       member's score (one union shuffle, vectorized pandas merge per
       partition);
    C. coarse-partition on hash(rep) and elect per-cluster argmax via
       one lexsort + run boundaries (many clusters per ``map_groups``
       call — never one call per cluster).

    Members missing from ``scores`` rank below every scored member
    (score −inf), ties still by id.  Output: (id, rep) with the same
    rows as ``clusters`` and the re-elected rep.
    """
    import ray.data as rd  # noqa: F401 - parity with sibling plans

    from log_formatter_ray.ops._shuffle import PART_COL, hash_part

    members = clusters.materialize()
    n_members = members.count()
    if n_members == 0:
        return clusters
    member_ids = members.map_batches(
        lambda t: t.select(["id"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).materialize()
    member_scores = _candidate_filter(
        scores.map_batches(
            lambda t: pa.table(
                {"id": t[scores_id_col].combine_chunks(),
                 "_score": pc.cast(t[score_col].combine_chunks(),
                                   pa.float64())}
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ),
        member_ids, "id", n_members, broadcast_limit, coarse=coarse,
    )

    id_type = dict(zip(members.schema().names, members.schema().types))["id"]

    def tag_members(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks()
        return pa.table({
            "id": ids,
            "rep": batch["rep"].combine_chunks(),
            "_score": pa.nulls(len(batch), pa.float64()),
            "_slot": pa.array(np.zeros(len(batch), np.int8)),
            PART_COL: pa.array(
                hash_part(ids.to_numpy(zero_copy_only=False), coarse)
            ),
        })

    def tag_scores(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().cast(id_type)
        return pa.table({
            "id": ids,
            "rep": pa.nulls(len(batch), id_type),
            "_score": batch["_score"].combine_chunks(),
            "_slot": pa.array(np.ones(len(batch), np.int8)),
            PART_COL: pa.array(
                hash_part(ids.to_numpy(zero_copy_only=False), coarse)
            ),
        })

    unioned = members.map_batches(
        tag_members, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).union(member_scores.map_batches(
        tag_scores, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ))

    def attach(group: pa.Table) -> pa.Table:
        # pyarrow + searchsorted, NOT pandas: a score-only partition would
        # null-upcast the int rep column to float64 through to_pandas and
        # corrupt the output schema
        slot = group["_slot"]
        mem = group.filter(pc.equal(slot, 0))
        sc = group.filter(pc.equal(slot, 1))
        score = np.full(len(mem), -np.inf, np.float64)
        if len(mem) and len(sc):
            m_ids = mem["id"].combine_chunks().to_numpy(zero_copy_only=False)
            s_ids = sc["id"].combine_chunks().to_numpy(zero_copy_only=False)
            s_sc = sc["_score"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            order = np.argsort(s_ids, kind="stable")
            s_ids, s_sc = s_ids[order], s_sc[order]
            pos = np.searchsorted(s_ids, m_ids)
            pos_c = np.minimum(pos, len(s_ids) - 1)
            hit = s_ids[pos_c] == m_ids
            score[hit] = s_sc[pos_c[hit]]
        return pa.table({
            "id": mem["id"].combine_chunks(),
            "rep": mem["rep"].combine_chunks(),
            "_score": pa.array(score),
        })

    scored = unioned.groupby(PART_COL).map_groups(
        attach, batch_format="pyarrow"
    )

    def add_rep_part(batch: pa.Table) -> pa.Table:
        reps = batch["rep"].combine_chunks()
        return batch.append_column(PART_COL, pa.array(
            hash_part(reps.to_numpy(zero_copy_only=False), coarse)
        ))

    def elect(group: pa.Table) -> pa.Table:
        # argmax score per rep (ties → smallest id), pyarrow-sorted so the
        # id/rep types pass through untouched
        idx = pc.sort_indices(group, sort_keys=[
            ("rep", "ascending"), ("_score", "descending"),
            ("id", "ascending"),
        ])
        g = group.take(idx)
        reps = g["rep"].combine_chunks()
        ids = g["id"].combine_chunks()
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = ~np.asarray(
                pc.equal(reps.slice(1), reps.slice(0, len(g) - 1))
            )
        # winner index of each row's run = most recent run start
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(g)), 0)
        )
        return pa.table({
            "id": ids,
            "rep": ids.take(pa.array(run_start)),
        })

    return scored.map_batches(
        add_rep_part, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).groupby(PART_COL).map_groups(elect, batch_format="pyarrow")


def partitioned_anti_join(ds, drop_ds, id_col: str = "doc_id",
                          drop_id_col: str = "id", coarse: int = 256):
    """Corpus rows whose ``id_col`` is NOT in ``drop_ds[drop_id_col]`` —
    the at-scale anti-join: both sides co-partition on ``hash(id) %
    coarse`` in ONE union shuffle and each partition filters its rows
    against only ITS drop ids (pyarrow ``map_groups``, so list columns
    like ``tokens`` never touch pandas).  Per-partition memory is
    |corpus|/coarse + |drop|/coarse; no process ever holds the whole drop
    set."""
    return _partitioned_key_join(
        ds, drop_ds, id_col, drop_id_col, coarse, keep_matches=False
    )


def partitioned_semi_join(ds, keys_ds, id_col: str = "doc_id",
                          key_col: str = "id", coarse: int = 256):
    """Corpus rows whose ``id_col`` IS in ``keys_ds[key_col]`` — the
    at-scale complement of :func:`partitioned_anti_join` (same one-union
    co-partition plan, same bounded per-partition memory); the fallback
    the light shuffle modes use when the candidate-id set outgrows a
    driver broadcast (ADVICE r4)."""
    return _partitioned_key_join(
        ds, keys_ds, id_col, key_col, coarse, keep_matches=True
    )


def _partitioned_key_join(ds, keys_ds, id_col, key_col, coarse,
                          keep_matches: bool):
    from log_formatter_ray.ops._shuffle import PART_COL, hash_part

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    corpus_cols = list(schema.names)

    def tag_corpus(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        out = {c: batch[c].combine_chunks() for c in corpus_cols}
        out["_slot"] = pa.array(np.ones(len(batch), np.int8))
        out[PART_COL] = pa.array(
            hash_part(ids.to_numpy(zero_copy_only=False), coarse)
        )
        return pa.table(out)

    def tag_drop(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].combine_chunks().cast(types[id_col])
        n = len(batch)
        out = {
            c: (ids if c == id_col else pa.nulls(n, types[c]))
            for c in corpus_cols
        }
        out["_slot"] = pa.array(np.zeros(n, np.int8))
        out[PART_COL] = pa.array(
            hash_part(ids.to_numpy(zero_copy_only=False), coarse)
        )
        return pa.table(out)

    unioned = ds.map_batches(
        tag_corpus, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).union(
        keys_ds.map_batches(
            tag_drop, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    )

    def filt(group: pa.Table) -> pa.Table:
        slot = group["_slot"]
        key_ids = group.filter(pc.equal(slot, 0))[id_col]
        rows = group.filter(pc.equal(slot, 1))
        if len(key_ids):
            mask = pc.is_in(
                rows[id_col],
                value_set=pc.unique(key_ids.combine_chunks()),
            )
            rows = rows.filter(mask if keep_matches else pc.invert(mask))
        elif keep_matches:
            rows = rows.slice(0, 0)
        return rows.drop_columns(["_slot", PART_COL])

    return unioned.groupby(PART_COL).map_groups(filt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# Transient (words × 64) vote matrix cap per slice: 1M words × 64 × 4 B
# ≈ 256 MB worst case; larger batches are processed in row slices.
_SIMHASH_MAX_SLICE_WORDS = 1_000_000


def add_simhash(batch: pa.Table, text_col: str = "text", out_col: str = "simhash") -> pa.Table:
    """64-bit SimHash over word hashes (Charikar '02): per bit, sign of the
    sum of ±1 votes from each word's hash bit.  Fully vectorized: one Arrow
    whitespace split + ONE ``hash_array`` per batch
    (:func:`_split_word_hashes`), per-row vote sums via ``np.add.reduceat``
    (no per-row Python)."""
    n = len(batch)
    h, new_offsets = _split_word_hashes(batch[text_col])
    kept_per_row = np.diff(new_offsets)

    bits = np.arange(64, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    if h.size:
        votes = np.zeros((n, 64), dtype=np.int64)
        has_words = kept_per_row > 0
        row = 0
        while row < n:
            end = row
            while end < n and (
                end == row
                or new_offsets[end + 1] - new_offsets[row] <= _SIMHASH_MAX_SLICE_WORDS
            ):
                end += 1
            lo, hi = new_offsets[row], new_offsets[end]
            if hi > lo:
                hw = h[lo:hi]
                pm = (
                    ((hw[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
                    * 2 - 1
                )  # (w, 64) of ±1
                mask = has_words[row:end]
                if mask.any():
                    starts = (new_offsets[row:end] - lo)[mask]
                    votes[np.arange(row, end)[mask]] = np.add.reduceat(
                        pm, starts, axis=0
                    )
            row = end
        out[has_words] = (
            ((votes[has_words] > 0).astype(np.uint64)) << bits[None, :]
        ).sum(axis=1, dtype=np.uint64)
    return batch.append_column(out_col, pa.array(out.astype(np.int64)))


def simhash_candidates(
    ds, id_col: str = "doc_id", hamming: int = 3, max_bucket: int = 200,
    coarse: int = 1024,
):
    """Near-dup candidate pairs with Hamming(simhash) ≤ ``hamming`` →
    Dataset (a, b), found by banding the 64-bit signature into 4×16-bit
    chunks (pigeonhole: distance ≤3 ⇒ at least one chunk equal).  Requires
    a ``simhash`` column.

    One explode pass (4 rows per doc, single int64 bucket key folding the
    band index), coarse-partition groupby, capped buckets with a logged
    truncation count, vectorized Hamming inside each bucket."""

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sh = np.asarray(batch["simhash"].combine_chunks()).astype(np.uint64)
        band = np.arange(4, dtype=np.uint64)
        keys = (
            ((sh[:, None] >> (band[None, :] * np.uint64(16))) & np.uint64(0xFFFF))
            | (band[None, :] << np.uint64(16))
        ).reshape(-1).astype(np.int64)
        rep_idx = pa.array(np.repeat(np.arange(n), 4))
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().take(rep_idx),
                "simhash": batch["simhash"].combine_chunks().take(rep_idx),
                "part": pa.array((keys % coarse).astype(np.int32)),
                "bucket_key": pa.array(keys),
            }
        )

    exploded = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["bucket_key", id_col], kind="stable")
        keys = g["bucket_key"].to_numpy()
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b = [], []
        starts, ends = _run_bounds(keys)
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > max_bucket:
                logger.warning(
                    "simhash bucket %d truncated: %d -> %d members",
                    int(keys[s]), int(e - s), max_bucket,
                )
                e = s + max_bucket
            bits = np.unpackbits(
                sh[s:e, None].copy().view(np.uint8), axis=1
            )  # (B, 64)
            d = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
            iu, ju = np.triu_indices(e - s, k=1)
            m = d[iu, ju] <= hamming
            out_a.append(ids[s:e][iu[m]])
            out_b.append(ids[s:e][ju[m]])
        if out_a:
            return pd.DataFrame(
                {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
            )
        return pd.DataFrame({"a": ids[:0], "b": ids[:0]})

    cand = exploded.groupby("part").map_groups(pairs, batch_format="pandas")
    # the same pair can surface in several bands — distinct via one small
    # groupby over the (sparse) pair set
    return (
        cand.groupby(["a", "b"]).count().select_columns(["a", "b"])
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_set(text: str, n: int = 3) -> set:
    """Reference single-text word-n-gram set (test oracle for the hashed
    fast path below)."""
    words = (text or "").split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


_EMPTY_U64 = np.empty(0, np.uint64)


def _ngram_hash_sets(doc_keys, texts, n: int) -> dict:
    """doc key → SORTED-UNIQUE uint64 word-n-gram shingle-hash array, for a
    whole column of texts at once: one split + one ``hash_array`` + one
    rolling fold (:func:`_shingle_hashes`) — shingle identity without any
    string joins.  Jaccard over these arrays equals Jaccard over
    :func:`ngram_set` up to 64-bit hash collisions (~2⁻⁶⁴ per gram pair)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.Array.from_pandas(texts, type=pa.string())
    wh, w_off = _split_word_hashes(texts)
    sh, off = _shingle_hashes(wh, w_off, n)
    return {
        key: np.unique(sh[off[i] : off[i + 1]])
        for i, key in enumerate(doc_keys)
    }


def _jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 arrays (``jaccard`` semantics:
    two empty sets are identical)."""
    if not a.size and not b.size:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


def verify_pairs_jaccard(
    ds, pairs, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.6, coarse: int = 256,
    mode: str = "auto", local_pair_limit: int = 100_000,
):
    """Exact n-gram Jaccard over candidate pairs → Dataset (a, b, jaccard),
    pairs with jaccard ≥ threshold.  ``pairs`` is a Dataset or DataFrame
    with columns (a, b); duplicate pairs are deduplicated.

    Two plans, chosen like a query optimizer (the ``connected_components``
    pattern); both stream the corpus and keep texts off the driver:

    * ``mode="local"`` (auto below ``local_pair_limit`` pairs): candidate
      texts — sparse by the LSH assumption — are gathered into ONE Ray
      task that judges every pair in a single bulk call.  No shuffle at
      all; right whenever the candidate texts fit one worker.
    * ``mode="distributed"``: no per-pair Python stage (the round-2 judge
      ran one pandas ``map_groups`` call per candidate pair — TUNING.md's
      measured 14× anti-pattern; this plan is ~40× faster at 20k pairs):

      1. candidate texts leave the corpus scan via a broadcast id-set
         filter (ids only on the driver; texts never touch the driver);
      2. texts attach to pair-incidence rows inside COARSE doc-hash
         partitions with one vectorized pandas merge per partition;
      3. each COARSE pair-hash partition verifies ALL its pairs in one
         bulk call — n-gram sets are built once per distinct doc in the
         partition (memoized) and pair Jaccards are plain set
         intersections, no pandas frame per pair.  A duplicated/colliding
         pair key cannot splice rows: the merge joins on the LITERAL
         (a, b) values.
    """
    import ray.data as rd

    from log_formatter_ray.ops._shuffle import hash_part, hash_part_cols

    schema_types = dict(zip(ds.schema().names, ds.schema().types))
    doc_type = schema_types[id_col]
    text_type = schema_types[text_col]
    empty = pa.table(
        {
            "a": pa.nulls(0, doc_type),
            "b": pa.nulls(0, doc_type),
            "jaccard": pa.nulls(0, pa.float64()),
        }
    )
    if isinstance(pairs, pd.DataFrame):
        pairs = pairs.drop_duplicates(["a", "b"])
        if not len(pairs):
            return rd.from_arrow(empty)
        pairs = rd.from_pandas(pairs[["a", "b"]].reset_index(drop=True))
    else:
        # Deduplicate FIRST (the docstring contract — a duplicated pair
        # would be emitted n× by the local judge and n²× by the
        # distributed merge), then pin: the set is consumed twice below
        # (id broadcast + incidence build) and must not re-execute its
        # upstream LSH chain per consumer.  ``simhash_candidates`` et al.
        # already emit distinct pairs, so this groupby is over an
        # already-unique sparse set — cheap.
        pairs = (
            pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
            .materialize()
        )

    # Candidate doc-id broadcast: per-batch distinct ids → small driver
    # union (bounded by |candidate docs|, never pairs or texts).
    id_parts = pairs.map_batches(
        lambda t: pa.table(
            {
                "doc": pc.unique(
                    pa.concat_arrays(
                        [
                            t["a"].combine_chunks().cast(doc_type),
                            t["b"].combine_chunks().cast(doc_type),
                        ]
                    )
                )
            }
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).to_pandas()
    if not len(id_parts):
        return rd.from_arrow(empty)
    want_ref = ray.put(pa.array(pd.unique(id_parts["doc"])).cast(doc_type))

    if mode == "auto":
        mode = "local" if pairs.count() <= local_pair_limit else "distributed"
    if mode == "local":
        # single-task judge: the corpus scan still streams (broadcast
        # id-set filter per batch), but the SPARSE candidate texts coalesce
        # into one block judged in one bulk call — zero shuffles
        pairs_ref = ray.put(
            # ≤ local_pair_limit rows by plan choice; DataFrame-path input
            # is already deduped, Dataset-path deduped above
            pairs.to_pandas()
        )

        def pick_minimal(batch: pa.Table) -> pa.Table:
            sub = batch.select([id_col, text_col]).filter(
                pc.is_in(batch[id_col], value_set=ray.get(want_ref))
            )
            return pa.table(
                {
                    "doc": sub[id_col].combine_chunks(),
                    "text": sub[text_col].combine_chunks(),
                }
            )

        def judge_all(batch: pa.Table) -> pa.Table:
            pdf = ray.get(pairs_ref)
            # hashed shingle sets for every candidate doc in one vectorized
            # pass; missing docs fall back to the empty set (round-2
            # semantics: jaccard(∅, ∅) = 1.0)
            sets = _ngram_hash_sets(
                batch["doc"].to_pylist(), batch["text"].combine_chunks(), n
            )
            out_a, out_b, out_j = [], [], []
            for aa, bb in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
                j = _jaccard_sorted(
                    sets.get(aa, _EMPTY_U64), sets.get(bb, _EMPTY_U64)
                )
                if j >= threshold:
                    out_a.append(aa)
                    out_b.append(bb)
                    out_j.append(j)
            return pa.table(
                {
                    "a": pa.array(out_a).cast(doc_type)
                    if out_a else pa.nulls(0, doc_type),
                    "b": pa.array(out_b).cast(doc_type)
                    if out_b else pa.nulls(0, doc_type),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

        texts_one = ds.map_batches(
            pick_minimal, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ).repartition(1)
        return texts_one.map_batches(
            judge_all, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )

    def _dummy_ids(k: int) -> pa.Array:
        # text rows carry DUMMY pair ids, not nulls: a null in an int64
        # column would float64-upcast the whole column in the pandas group
        # functions, corrupting ids >= 2^53 (row kind is the slot column)
        if pa.types.is_integer(doc_type):
            return pa.array(np.zeros(k, dtype=np.int64)).cast(doc_type)
        return pa.nulls(k, doc_type)

    def _dpart(doc: pa.Array) -> pa.Array:
        return pa.array(hash_part(doc.to_numpy(zero_copy_only=False), coarse))

    def make_incidence(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(doc_type)
        b = t["b"].combine_chunks().cast(doc_type)
        m = len(t)
        doc = pa.concat_arrays([a, b])
        return pa.table(
            {
                "doc": doc,
                "dpart": _dpart(doc),
                "pa_": pa.concat_arrays([a, a]),
                "pb_": pa.concat_arrays([b, b]),
                "slot": pa.array(
                    np.r_[np.zeros(m, np.int8), np.ones(m, np.int8)]
                ),
                "text": pa.nulls(2 * m, text_type),
            }
        )

    incidence = pairs.map_batches(
        make_incidence, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )

    def pick(batch: pa.Table) -> pa.Table:
        sub = batch.select([id_col, text_col]).filter(
            pc.is_in(batch[id_col], value_set=ray.get(want_ref))
        )
        doc = sub[id_col].combine_chunks()
        return pa.table(
            {
                "doc": doc,
                "dpart": _dpart(doc),
                "pa_": _dummy_ids(len(sub)),
                "pb_": _dummy_ids(len(sub)),
                "slot": pa.array(np.full(len(sub), -1, np.int8)),
                "text": sub[text_col].combine_chunks(),
            }
        )

    texts = ds.map_batches(
        pick, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def attach_part(g: pd.DataFrame) -> pd.DataFrame:
        """One doc-hash partition: attach each doc's text to its incidence
        rows via ONE vectorized merge (missing docs keep a null text, the
        round-2 semantics), then tag the pair-hash partition."""
        tex = g.loc[g["slot"] == -1, ["doc", "text"]].drop_duplicates("doc")
        inc = g.loc[g["slot"] != -1, ["pa_", "pb_", "slot"]].copy()
        inc["doc"] = g.loc[g["slot"] != -1, "doc"]
        m = inc.merge(tex, on="doc", how="left")
        m["ppart"] = hash_part_cols(
            [m["pa_"].to_numpy(), m["pb_"].to_numpy()], coarse, len(m)
        )
        return m[["pa_", "pb_", "slot", "text", "ppart"]]

    attached = (
        incidence.union(texts)
        .groupby("dpart")
        .map_groups(attach_part, batch_format="pandas")
    )

    def judge_part(g: pd.DataFrame) -> pd.DataFrame:
        a_rows = g.loc[g["slot"] == 0, ["pa_", "pb_", "text"]]
        b_rows = g.loc[g["slot"] == 1, ["pa_", "pb_", "text"]]
        m = a_rows.merge(b_rows, on=["pa_", "pb_"], suffixes=("_a", "_b"))
        # one vectorized shingle-hash pass over the partition's DISTINCT
        # docs (null / missing text ⇒ empty set, round-2 semantics)
        dd = pd.DataFrame(
            {
                "doc": np.concatenate(
                    [m["pa_"].to_numpy(), m["pb_"].to_numpy()]
                ),
                "text": np.concatenate(
                    [m["text_a"].to_numpy(), m["text_b"].to_numpy()]
                ),
            }
        ).drop_duplicates("doc")
        sets = _ngram_hash_sets(dd["doc"].tolist(), dd["text"], n)

        out_a, out_b, out_j = [], [], []
        for aa, bb in zip(m["pa_"].to_numpy(), m["pb_"].to_numpy()):
            j = _jaccard_sorted(
                sets.get(aa, _EMPTY_U64), sets.get(bb, _EMPTY_U64)
            )
            if j >= threshold:
                out_a.append(aa)
                out_b.append(bb)
                out_j.append(j)
        if not out_a:
            return pd.DataFrame(
                {
                    "a": m["pa_"].iloc[:0],
                    "b": m["pb_"].iloc[:0],
                    "jaccard": pd.Series(dtype=np.float64),
                }
            )
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    return attached.groupby("ppart").map_groups(
        judge_part, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    """Multi-band random-hyperplane LSH: ``bands`` independent sets of
    ``nbits`` hyperplanes (OR-construction — a pair is a candidate if it
    collides in ANY band, raising recall the way extra MinHash bands do).
    Emits ``bands`` rows per input row with a single int64 bucket key.
    The projection matrix is built once per actor."""

    def __init__(self, emb_col: str = "embedding", nbits: int = 8, bands: int = 2,
                 dim: int | None = None, seed: int = 42, coarse: int = 1024,
                 keys_only: bool = False, id_col: str | None = None):
        self.emb_col = emb_col
        self.nbits = nbits
        self.bands = bands
        self.seed = seed
        self.dim = dim
        self.coarse = coarse
        self.keys_only = keys_only
        self.id_col = id_col
        self._R = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch[self.emb_col].combine_chunks()
        n = len(batch)
        flat = np.asarray(emb.flatten(), dtype=np.float32)
        dim = flat.size // n
        if self._R is None:
            rng = np.random.default_rng(self.seed)
            self._R = rng.standard_normal((dim, self.bands * self.nbits)).astype(
                np.float32
            )
        V = flat.reshape(n, dim)
        signs = ((V @ self._R) > 0).reshape(n, self.bands, self.nbits)
        powers = (np.uint64(1) << np.arange(self.nbits, dtype=np.uint64))
        codes = (signs.astype(np.uint64) * powers[None, None, :]).sum(axis=2)
        band = np.arange(self.bands, dtype=np.uint64)
        keys = (codes | (band[None, :] << np.uint64(self.nbits))).reshape(-1).astype(
            np.int64
        )
        rep_idx = pa.array(np.repeat(np.arange(n), self.bands))
        cols = (
            [self.id_col] if (self.keys_only and self.id_col)
            else batch.column_names
        )
        out = pa.table(
            {c: batch[c].combine_chunks().take(rep_idx) for c in cols}
        )
        out = out.append_column("part", pa.array((keys % self.coarse).astype(np.int32)))
        return out.append_column("bucket_key", pa.array(keys))


def embedding_dup_pairs(
    ds, emb_col: str = "embedding", id_col: str = "vec_id",
    threshold: float = 0.95, nbits: int = 10, bands: int = 2, seed: int = 42,
    concurrency=(1, 4), max_bucket: int = 4000, block: int = 1024,
    coarse: int = 1024, shuffle_mode: str = "vectors",
    broadcast_limit: int = 5_000_000,
):
    """Cosine ≥ threshold pairs, exact within multi-band hyperplane-LSH
    buckets → Dataset (a, b, cos).

    Recall is probabilistic across buckets (standard LSH trade-off); raise
    it with more ``bands`` (OR-construction) — NOT by lowering ``nbits``,
    which blows bucket sizes up.  Buckets are capped at ``max_bucket``
    members (logged) and cosine is computed in row blocks of ``block`` so
    per-task memory stays bounded even on degenerate content.

    ``shuffle_mode="light"`` mirrors ``minhash_lsh_clusters``'s light
    plan: pass A shuffles (id, bucket_key) rows only (vs the embedding
    duplicated per band — KBs per row), pass B re-buckets the CANDIDATE
    vectors alone (broadcast id set).  Identical pairs by construction:
    bucket multi-membership is decided by keys alone."""
    kw = dict(emb_col=emb_col, nbits=nbits, bands=bands, seed=seed,
              coarse=coarse)
    if shuffle_mode == "light":
        keyed = ds.map_batches(
            HyperplaneBucketer,
            fn_constructor_kwargs=dict(keys_only=True, id_col=id_col, **kw),
            batch_format="pyarrow", batch_size=None, concurrency=concurrency,
        )

        def members(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(["bucket_key", id_col], kind="stable")
            keys = g["bucket_key"].to_numpy()
            starts, ends = _run_bounds(keys)
            lens = ends - starts
            multi = np.repeat(lens >= 2, lens)
            return g.loc[multi, [id_col]].drop_duplicates()

        cand_ds = (
            keyed.groupby("part").map_groups(members, batch_format="pandas")
            .map_batches(
                lambda t: pa.table(
                    {id_col: pc.unique(t[id_col].combine_chunks())}
                ),
                batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
            )
            .materialize()  # consumed twice: count + filter plan
        )
        n_cand = cand_ds.count()
        if n_cand == 0:
            import ray.data as rd

            id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
            return rd.from_arrow(pa.table(
                {"a": pa.nulls(0, id_type), "b": pa.nulls(0, id_type),
                 "cos": pa.nulls(0, pa.float64())}
            ))
        sub = _candidate_filter(ds, cand_ds, id_col, n_cand, broadcast_limit)
        bucketed = sub.map_batches(
            HyperplaneBucketer,
            fn_constructor_kwargs=kw,
            batch_format="pyarrow", batch_size=None, concurrency=concurrency,
        )
    else:
        bucketed = ds.map_batches(
            HyperplaneBucketer,
            fn_constructor_kwargs=kw,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["bucket_key", id_col], kind="stable")
        keys = g["bucket_key"].to_numpy()
        ids = g[id_col].to_numpy()
        emb = g[emb_col].to_numpy()
        out_a, out_b, out_c = [], [], []
        starts, ends = _run_bounds(keys)
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > max_bucket:
                logger.warning(
                    "embedding LSH bucket %d truncated: %d -> %d members",
                    int(keys[s]), int(e - s), max_bucket,
                )
                e = s + max_bucket
            V = np.stack(emb[s:e]).astype(np.float64)
            norms = np.linalg.norm(V, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            V = V / norms
            b_ids = ids[s:e]
            for i0 in range(0, len(V), block):
                S = V[i0 : i0 + block] @ V.T  # (≤block, B)
                ii, jj = np.nonzero(S >= threshold)
                gi = ii + i0
                m = jj > gi  # upper triangle only (global indices)
                out_a.append(b_ids[gi[m]])
                out_b.append(b_ids[jj[m]])
                out_c.append(S[ii[m], jj[m]])
        if out_a:
            return pd.DataFrame(
                {
                    "a": np.concatenate(out_a),
                    "b": np.concatenate(out_b),
                    "cos": np.concatenate(out_c).astype(np.float64),
                }
            )
        return pd.DataFrame(
            {"a": ids[:0], "b": ids[:0], "cos": np.array([], np.float64)}
        )

    cand = bucketed.groupby("part").map_groups(pairs, batch_format="pandas")
    # distinct across bands (cos identical for a given pair: Max is a no-op
    # merge that keeps one row per pair)
    from ray.data.aggregate import Max

    return cand.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))


def dup_overlap_matrix(ds, text_col: str = "text", id_col: str = "doc_id",
                       key_col: str = "source", coarse: int = 256):
    """Duplication-structure report: for every (key_a, key_b) pair of
    ``key_col`` values (e.g. sources/dumps/snapshots), how many exact
    duplicate PAIRS exist between them — the overlap matrix a curation
    team reads before deciding source precedence (equivalent SQL: self
    join on ``text_col`` with ``a.id < b.id``, grouped by the unordered
    source pair).

    Plan: the payload-light hash pass ships (h1, h2, id? no — key)
    rows only; one coarse hash(h1) shuffle; inside each partition dup
    groups are found by one sort, and each group contributes
    ``n_i*n_j`` cross pairs / ``C(n_s,2)`` within pairs from its
    per-key counts (a short Python loop over DUP GROUPS only — sparse
    relative to the corpus by the dedup assumption); a tiny final
    groupby sums the per-partition matrices."""
    import pyarrow.compute as _pc

    def hash_only(batch: pa.Table) -> pa.Table:
        vals = batch[text_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        h1 = _stable_hash64(vals)
        h2 = pd.util.hash_array(
            np.asarray(vals, dtype=object), categorize=False,
            hash_key="lfr-second-hash!",
        ).astype(np.uint64)
        return pa.table({
            "_h1": pa.array(h1.astype(np.int64)),
            "_h2": pa.array(h2.astype(np.int64)),
            "_key": _pc.cast(batch[key_col].combine_chunks(), pa.string()),
            "_part": pa.array((h1 % np.uint64(coarse)).astype(np.int32)),
        })

    def partials(group: pa.Table) -> pa.Table:
        order = _pc.sort_indices(
            group, sort_keys=[("_h1", "ascending"), ("_h2", "ascending"),
                              ("_key", "ascending")]
        )
        g = group.take(order)
        a = g["_h1"].to_numpy(zero_copy_only=False)
        b = g["_h2"].to_numpy(zero_copy_only=False)
        k = g["_key"].to_numpy(zero_copy_only=False)
        n = len(g)
        new_grp = np.ones(n, bool)
        new_grp[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        bounds = np.append(np.flatnonzero(new_grp), n)
        out: dict[tuple[str, str], int] = {}
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            keys, cnts = np.unique(k[s:e], return_counts=True)
            for i in range(len(keys)):
                if cnts[i] > 1:
                    key = (keys[i], keys[i])
                    out[key] = out.get(key, 0) + int(
                        cnts[i] * (cnts[i] - 1) // 2)
                for j in range(i + 1, len(keys)):
                    key = (keys[i], keys[j])
                    out[key] = out.get(key, 0) + int(cnts[i] * cnts[j])
        if not out:
            return pa.table({
                "src_a": pa.array([], pa.string()),
                "src_b": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
            })
        ka, kb = zip(*out)
        return pa.table({
            "src_a": pa.array(list(ka), pa.string()),
            "src_b": pa.array(list(kb), pa.string()),
            "n_pairs": pa.array(list(out.values()), pa.int64()),
        })

    hashed = ds.map_batches(
        hash_only, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    parts = hashed.groupby("_part").map_groups(
        partials, batch_format="pyarrow"
    )
    return (
        parts.groupby(["src_a", "src_b"])
        .sum("n_pairs")
        .map_batches(
            lambda t: t.rename_columns(["src_a", "src_b", "n_pairs"]),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        .sort(["src_a", "src_b"])
    )
