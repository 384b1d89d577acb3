"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the part that must survive 100 TB):

* **Exact** — hash first (64-bit content hash per batch, vectorized), then a
  single hash-partitioned ``groupby`` over the HASH (uniform by
  construction, no text-key skew), keep min-id per distinct content inside
  each group.  The only shuffle moves (hash, id, text) — not the token
  payload.
* **MinHash+LSH** — signatures per batch in an actor pool (hash matrices
  built once per actor), band-explode to (band, band_hash, id) rows — a few
  dozen small rows per doc — and ``groupby`` the BANDS, never the corpus.
  Candidate pairs estimate Jaccard from signature agreement (no second pass
  over text); union-find over the (assumed sparse) candidate edge list runs
  on the driver — the standard assumption that near-dup candidate edges
  ≪ corpus size; if a band bucket explodes (degenerate content), its bucket
  is truncated at ``max_bucket`` with a logged count.
* **SimHash** — 64-bit signature per doc; candidates from 4×16-bit band
  buckets (any pair within Hamming ≤3 shares ≥1 exact 16-bit band by
  pigeonhole).
* **Embedding** — random-hyperplane LSH buckets (broadcast projection
  matrix), exact cosine within bucket only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

_MERSENNE31 = np.uint64((1 << 31) - 1)


def _stable_hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit string hash (pandas siphash with the
    fixed default key — stable across processes and runs)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def _add_content_hash(text_col: str, out_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        h = _stable_hash64(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(h.astype(np.int64)))

    return fn


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-``id_col`` row per distinct ``text_col`` value.

    Hash-collision-safe: groups are formed on the 64-bit hash (uniform
    shuffle key), but the keeper is chosen per *actual* content within the
    group.
    """
    hashed = ds.map_batches(_add_content_hash(text_col, "_h"), batch_format="pyarrow")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # head(1) keeps the WHOLE min-id row; .first() would take the first
        # non-null value per column, splicing fields from dropped duplicates.
        return (
            group.sort_values(id_col)
            .groupby(text_col, sort=False, group_keys=False)
            .head(1)
        )

    out = hashed.groupby("_h").map_groups(keep_first, batch_format="pandas")
    return out.drop_columns(["_h"])


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

    # Cap on the transient (num_perm × shingles) permutation matrix per
    # slice: 1M shingles × 64 perms × 8 B ≈ 512 MB worst case; long-doc
    # batches are processed in row slices under this bound instead of
    # materializing one batch-wide matrix.
    MAX_SLICE_SHINGLES = 1_000_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        k = self.shingle_k
        # Collect every row's shingles, hash them in ONE vectorized call
        # (one hash_array per batch instead of one per row), then take
        # per-row minima with reduceat over the flat (num_perm, S) matrix.
        all_shingles: list[str] = []
        offsets = [0]
        for t in texts:
            words = (t or "").split()
            if len(words) >= k:
                row = {" ".join(words[j : j + k]) for j in range(len(words) - k + 1)}
            else:
                row = {" ".join(words)} if words else set()
            all_shingles.extend(row)
            offsets.append(len(all_shingles))
        offsets = np.asarray(offsets, dtype=np.int64)

        sigs = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
        if all_shingles:
            h_all = _stable_hash64(all_shingles) % _MERSENNE31  # (S,)
            # slice rows so the (num_perm, slice_shingles) matrix stays
            # bounded regardless of document lengths
            row = 0
            n_rows = len(texts)
            while row < n_rows:
                end = row
                while (
                    end < n_rows
                    and (end == row
                         or offsets[end + 1] - offsets[row] <= self.MAX_SLICE_SHINGLES)
                ):
                    end += 1
                lo, hi = offsets[row], offsets[end]
                if hi > lo:
                    h = h_all[lo:hi]
                    vals = (
                        self.a[:, None] * h[None, :] + self.b[:, None]
                    ) % _MERSENNE31
                    local_off = offsets[row:end] - lo
                    nonempty = local_off < (offsets[row + 1 : end + 1] - lo)
                    if nonempty.any():
                        mins = np.minimum.reduceat(
                            vals, local_off[nonempty], axis=1
                        )
                        idx = np.arange(row, end)[nonempty]
                        sigs[idx] = mins.T
                row = end
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sig": sig_list,
            }
        )


def _band_explode(num_perm: int, bands: int, id_col: str):
    rows_per_band = num_perm // bands

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sigs = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        ids = batch[id_col].to_pylist()
        band_ids = np.tile(np.arange(bands), n)
        # band hash: mix the r signature values of each band into one uint64
        chunks = sigs.reshape(n, bands, rows_per_band).astype(np.uint64)
        mixed = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            mixed = mixed * np.uint64(1099511628211) + chunks[:, :, j]
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "band": pa.array(band_ids.astype(np.int32)),
                "band_hash": pa.array(mixed.reshape(-1).astype(np.int64)),
            }
        )

    return fn


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller id becomes the representative (deterministic)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def minhash_lsh_clusters(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.6,
    seed: int = 42,
    concurrency=(1, 8),
    max_bucket: int = 200,
) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering → DataFrame (id, rep) for docs in
    clusters of size ≥ 2 (rep = min id in cluster).

    Shuffle footprint: only (id, band, band_hash) rows and the per-bucket
    signature fetch — the corpus itself never shuffles.
    """
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            shingle_k=shingle_k, seed=seed,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).materialize()  # consumed twice (sig_map + band explode): compute once
    sig_map: dict = {}
    for b in sigs.iter_batches(batch_format="pyarrow"):
        n = len(b)
        arr = np.asarray(b["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        for i, d in enumerate(b[id_col].to_pylist()):
            sig_map[d] = arr[i]
    # NOTE: sig_map materializes one small signature row per doc on the
    # driver — fine to ~10^8 docs; beyond that, verify pairs with a
    # distributed join of sigs onto the candidate edges instead.

    exploded = sigs.map_batches(
        _band_explode(num_perm, bands, id_col), batch_format="pyarrow"
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].tolist())
        if len(ids) > max_bucket:
            ids = ids[:max_bucket]
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        exploded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    uf = _UnionFind()
    if len(pairs):
        pairs = pairs.drop_duplicates()
        for a, b in zip(pairs["a"], pairs["b"]):
            est = float(np.mean(sig_map[a] == sig_map[b]))
            if est >= threshold:
                uf.union(a, b)
    reps = {x: uf.find(x) for x in list(uf.parent)}
    out = (
        pd.DataFrame({"id": list(reps), "rep": list(reps.values())})
        .sort_values("id")
        .reset_index(drop=True)
    )
    sizes = out.groupby("rep")["id"].transform("size")
    return out[sizes >= 2].reset_index(drop=True)


def dedup_by_clusters(ds, clusters: pd.DataFrame, id_col: str = "doc_id"):
    """Drop every cluster member except its representative — the drop set is
    broadcast (small) and applied as a vectorized filter per batch."""
    drop = set(clusters.loc[clusters["id"] != clusters["rep"], "id"].tolist())
    if not drop:  # nothing to drop; an empty pa.array is null-typed and
        return ds  # would make pc.is_in raise against a string column
    drop_ref = ray.put(pa.array(list(drop)))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch[id_col], value_set=ray.get(drop_ref)))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def add_simhash(batch: pa.Table, text_col: str = "text", out_col: str = "simhash") -> pa.Table:
    """64-bit SimHash over word hashes (Charikar '02): per bit, sign of the
    sum of ±1 votes from each word's hash bit."""
    out = np.zeros(len(batch), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        words = (t or "").split()
        if not words:
            continue
        h = _stable_hash64(words)
        votes = (((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1).sum(
            axis=0
        )
        out[i] = np.uint64(((votes > 0).astype(np.uint64) << bits).sum(dtype=np.uint64))
    return batch.append_column(out_col, pa.array(out.astype(np.int64)))


def simhash_candidates(ds, id_col: str = "doc_id", hamming: int = 3) -> pd.DataFrame:
    """Near-dup candidate pairs with Hamming(simhash) ≤ ``hamming``, found by
    banding the 64-bit signature into 4×16-bit chunks (pigeonhole: distance
    ≤3 ⇒ at least one chunk equal). Requires a ``simhash`` column."""
    ds = ds.materialize()  # four union branches would re-execute upstream
    parts = []
    for band in range(4):
        shift = np.uint64(16 * band)

        def key(batch: pa.Table, shift=shift, band=band) -> pa.Table:
            sh = np.asarray(batch["simhash"].combine_chunks()).astype(np.uint64)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "simhash": batch["simhash"],
                    "band": pa.array(np.full(len(batch), band, np.int32)),
                    "bkey": pa.array(((sh >> shift) & np.uint64(0xFFFF)).astype(np.int32)),
                }
            )

        parts.append(ds.map_batches(key, batch_format="pyarrow"))
    exploded = parts[0].union(*parts[1:])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].tolist()
        sh = g["simhash"].astype(np.uint64).tolist()
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(sh[i]) ^ int(sh[j])).count("1")
                if d <= hamming:
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    out = (
        exploded.groupby(["band", "bkey"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return out.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_set(text: str, n: int = 3) -> set:
    words = (text or "").split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def verify_pairs_jaccard(
    ds, pairs: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.6,
) -> pd.DataFrame:
    """Exact n-gram Jaccard over candidate pairs.  Fetches ONLY the candidate
    docs' texts (broadcast id-set filter), never the corpus."""
    if not len(pairs):
        return pd.DataFrame(columns=["a", "b", "jaccard"])
    wanted = set(pairs["a"]) | set(pairs["b"])
    want_ref = ray.put(pa.array(list(wanted)))

    def pick(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, text_col]).filter(
            pc.is_in(batch[id_col], value_set=ray.get(want_ref))
        )

    texts = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    text_of = dict(zip(texts[id_col], texts[text_col]))
    sets = {d: ngram_set(t, n) for d, t in text_of.items()}
    js = [jaccard(sets[a], sets[b]) for a, b in zip(pairs["a"], pairs["b"])]
    out = pairs.assign(jaccard=js)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    """Random-hyperplane LSH bucket per row (broadcast projection matrix,
    built once per actor)."""

    def __init__(self, emb_col: str = "embedding", nbits: int = 8, dim: int | None = None,
                 seed: int = 42):
        self.emb_col = emb_col
        self.nbits = nbits
        self.seed = seed
        self.dim = dim
        self._R = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch[self.emb_col].combine_chunks()
        n = len(batch)
        flat = np.asarray(emb.flatten(), dtype=np.float32)
        dim = flat.size // n
        if self._R is None:
            rng = np.random.default_rng(self.seed)
            self._R = rng.standard_normal((dim, self.nbits)).astype(np.float32)
        V = flat.reshape(n, dim)
        signs = (V @ self._R) > 0
        bucket = (signs.astype(np.uint32) << np.arange(self.nbits, dtype=np.uint32)).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket.astype(np.int32)))


def embedding_dup_pairs(
    ds, emb_col: str = "embedding", id_col: str = "vec_id",
    threshold: float = 0.95, nbits: int = 8, seed: int = 42, concurrency=(1, 4),
) -> pd.DataFrame:
    """Cosine ≥ threshold pairs, exact within hyperplane-LSH buckets.

    Recall is probabilistic across buckets (standard LSH trade-off); raise
    recall by lowering nbits or running multiple seeds and unioning pairs.
    """
    bucketed = ds.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs=dict(emb_col=emb_col, nbits=nbits, seed=seed),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        V = np.stack(group[emb_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        S = V @ V.T
        a, b, c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= threshold:
                    x, y = sorted((ids[i], ids[j]))
                    a.append(x); b.append(y); c.append(float(S[i, j]))
        return pd.DataFrame({"a": a, "b": b, "cos": c})

    out = bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty or "a" not in out.columns:  # no near-dups anywhere
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
