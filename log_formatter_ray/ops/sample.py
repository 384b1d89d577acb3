"""Deterministic sampling and splitting — the data-mixing primitives a
training pipeline runs before anything else.

Everything here keys on the process-stable 64-bit content hash of an id
column, NEVER Python's salted ``hash()`` and never an RNG — so any two
runs (and any two parallelism levels) select byte-identical row sets, a
resumability requirement at 100 TB.

* ``split_by_hash`` — assign each row to train/val/test (or any weighted
  buckets) by ``hash(id) % denom``: a row's split never changes when the
  corpus grows, shrinks, or is re-sharded.
* ``sample_by_hash`` — keep a deterministic ~fraction of rows (same
  mechanism, one bucket).
* ``reservoir_top_hash`` — EXACTLY-k deterministic "uniform" sample: keep
  the k smallest hash priorities via per-block partial top-k (k rows per
  block cross the wire, nothing shuffles; the driver merges k-row
  partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from log_formatter_ray.ops.dedup import _stable_hash64


def _hash_mod(batch: pa.Table, id_col: str, denom: int) -> np.ndarray:
    vals = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    return (_stable_hash64(vals) % np.uint64(denom)).astype(np.int64)


def split_by_hash(
    ds,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    denom: int = 10_000,
    out_col: str = "split",
):
    """Add a ``split`` column by hash bucket.  ``splits`` maps name →
    fraction (must sum to ≤ 1; the remainder, if any, gets "rest")."""
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    if any(f < 0 for f in splits.values()):
        raise ValueError(f"split fractions must be non-negative: {splits}")
    if sum(splits.values()) > 1 + 1e-9:
        raise ValueError(f"split fractions sum to more than 1: {splits}")
    names, bounds, acc = [], [], 0.0
    for name, frac in splits.items():
        acc += frac
        names.append(name)
        bounds.append(int(round(acc * denom)))
    if bounds and bounds[-1] < denom:
        names.append("rest")
        bounds.append(denom)
    names_arr = np.array(names, dtype=object)
    bounds_arr = np.array(bounds, dtype=np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        h = _hash_mod(batch, id_col, denom)
        idx = np.searchsorted(bounds_arr, h, side="right")
        return batch.append_column(out_col, pa.array(names_arr[idx], pa.string()))

    return ds.map_batches(
        tag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def sample_by_hash(ds, frac: float, id_col: str = "doc_id", denom: int = 10_000):
    """Keep a deterministic ≈``frac`` of rows (exact row set is stable
    across runs, shard layouts, and cluster sizes)."""
    cut = int(round(frac * denom))

    def keep(batch: pa.Table) -> pa.Table:
        h = _hash_mod(batch, id_col, denom)
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(
        keep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def reservoir_top_hash(ds, k: int, id_col: str = "doc_id",
                       reduce_partitions: int = 8) -> pd.DataFrame:
    """Exactly ``min(k, n)`` rows with the smallest hash priority — a
    deterministic uniform-ish sample.  Per-block partial top-k (k rows per
    block travel), then a SECOND distributed top-k level over
    ``reduce_partitions`` coalesced blocks, so the driver merge is
    O(reduce_partitions × k) regardless of block count (at 10^5-10^6
    blocks a single-level merge would drag blocks×k rows to the driver);
    the corpus never shuffles.  Exact: top-k of per-block top-k's is the
    global top-k."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = _stable_hash64(vals)
        take = min(k, len(h))
        order = np.lexsort((vals, h))[:take]
        out = batch.take(pa.array(order))
        return out.append_column("_prio", pa.array(h[order].astype(np.int64)))

    def refine(batch: pa.Table) -> pa.Table:
        prio = batch["_prio"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vals = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, prio))[: min(k, len(prio))]
        return batch.take(pa.array(order))

    partials = (
        ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .repartition(reduce_partitions)
        .map_batches(
            refine, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    # _prio carries the uint64 priority in int64 bits; reinterpret before
    # sorting (a plain int64 sort would rank wrapped-negative hashes first)
    prio = partials["_prio"].to_numpy().astype(np.uint64)
    order = np.lexsort((partials[id_col].to_numpy(), prio))[:k]
    return (
        partials.iloc[order].drop(columns=["_prio"]).reset_index(drop=True)
    )


def two_level_shuffle(ds, seed: int, id_col: str = "doc_id"):
    """Training-ingestion shuffle WITHOUT an all-to-all: randomize the
    block order (metadata-only — Ray reorders block references, no data
    moves), then permute rows inside each block.  This is the standard
    two-level approximation of a global ``random_shuffle`` for epoch
    shuffling at 100 TB: the full shuffle moves every byte through the
    object store; this plan moves none.

    Determinism contract (same flavor as the rest of this module): the
    within-block permutation is seeded from ``seed`` XOR a content hash of
    the block's ids — NOT from task index or scheduling order — so a given
    block permutes identically no matter which worker runs it or when.
    The block-order level is seeded too; with an identical block layout
    (same files, same splits) the full output order reproduces exactly.
    Output rows are exactly the input rows (a permutation — the oracle
    checks the multiset is untouched).

    Mixing quality: rows can only land within their block, so two rows
    from one file never end up a full corpus apart in one epoch — the
    documented trade of every two-level shuffle.  Vary ``seed`` per epoch;
    for stronger mixing write with more, smaller shards (the shard count
    is the mixing radius knob).
    """

    def perm(b: pa.Table) -> pa.Table:
        if b.num_rows <= 1:
            return b
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = _stable_hash64(ids)
        block_key = np.bitwise_xor.reduce(h) ^ np.uint64(seed & (2**64 - 1))
        rng = np.random.default_rng(int(block_key))
        return b.take(pa.array(rng.permutation(b.num_rows)))

    return ds.randomize_block_order(seed=seed).map_batches(
        perm, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def mixture_rates(counts: dict[str, int], weights: dict[str, float],
                  denom: int = 1_000_000) -> dict[str, int]:
    """Per-source hash-threshold keep rates that rebalance a corpus to
    target ``weights`` (the data-MIXING step: e.g. web 60% / code 25% /
    books 15%) at the largest output size no source has to over-sample
    for.

    The binding source is the one whose supply runs out first at its
    target share: ``N = min_s(counts[s] / weights[s])``; every source then
    keeps ``weights[s]·N / counts[s]`` of its rows (the binding source
    keeps 100% — this op never duplicates rows; repeat-epoch upsampling
    is a separate concern).  Sources with weight 0 — and sources absent
    from ``weights`` — are dropped.  Returns integer thresholds out of
    ``denom`` for :func:`sample_mixture`'s hash filter.
    """
    active = {s: w for s, w in weights.items() if w > 0 and counts.get(s)}
    if not active:
        return {}
    wsum = sum(active.values())
    n_out = min(counts[s] / (w / wsum) for s, w in active.items())
    return {
        s: min(denom, int(round((w / wsum) * n_out / counts[s] * denom)))
        for s, w in active.items()
    }


def sample_mixture(ds, weights: dict[str, float], source_col: str = "source",
                   id_col: str = "doc_id", denom: int = 1_000_000):
    """Deterministic weighted source mixing, two passes: pass 1 is a tiny
    per-source count groupby (|sources| rows to the driver); the rates
    from :func:`mixture_rates` broadcast in the task closure; pass 2
    streams the corpus through a per-source hash-threshold filter — the
    same stable content hash as every sampler here, so the selected row
    set is identical across runs, shard layouts, and cluster sizes.

    Rates are ≈exact (hash-threshold keeps a binomial-concentrated
    fraction, ±O(1/√n) of target — the at-scale trade; exact-k per source
    would need a per-source distributed selection).
    """
    from ray.data.aggregate import Count

    cnt = ds.groupby(source_col).aggregate(Count(alias_name="n")).take_all()
    rates = mixture_rates({r[source_col]: r["n"] for r in cnt}, weights,
                          denom=denom)

    def keep(batch: pa.Table) -> pa.Table:
        src = batch[source_col].combine_chunks().to_numpy(zero_copy_only=False)
        cuts = np.array([rates.get(s, 0) for s in pd.unique(src)],
                        dtype=np.int64)
        inv = pd.Series(np.arange(len(cuts)),
                        index=pd.unique(src)).reindex(src).to_numpy(np.int64)
        h = _hash_mod(batch, id_col, denom)
        return batch.filter(pa.array(h < cuts[inv]))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def stratified_sample(ds, key_col: str, k: int, id_col: str = "doc_id",
                      columns: list[str] | None = None):
    """EXACT-``k`` deterministic sample per stratum (quota sampling — the
    companion to :func:`sample_mixture`'s ≈exact hash-threshold rates):
    each ``key_col`` group keeps its ``k`` rows with the smallest
    ``md5(id)`` (ties by id).

    md5 of the ID string is the selection order precisely because it is
    ENGINE-NEUTRAL: any SQL system reproduces the exact same sample with
    ``row_number() OVER (PARTITION BY key ORDER BY md5(id), id) <= k`` —
    the DuckDB oracle compares hash-exact.  Selection is independent of
    shard layout and parallelism (pure function of the row), and
    deterministic across epochs.

    Plan (the repo's coarse-keyed discipline): a vectorized md5 rank
    column inside ``map_batches`` (the duckdb-backed kernel from
    ``textstats.add_fingerprint_md5``), a per-block PRE-TOP-K (each block
    keeps at most ``k`` rows per key it sees — the partial-aggregation
    combiner, so a hot stratum ships ≤ k×blocks rows, never its row
    count), then ONE hash(key)-coarse-partition groupby whose partitions
    run a vectorized per-key top-k (lexsort + run boundaries — many keys
    per ``map_groups`` call, never one group per stratum).  Only
    ``columns`` (+ key/id/rank) travel through the shuffle — pass a
    narrow projection for wide corpora.
    """
    import pyarrow.compute as pc

    from log_formatter_ray.ops._shuffle import PART_COL, hash_part
    from log_formatter_ray.ops.textstats import add_fingerprint_md5

    keep = list(dict.fromkeys(
        [key_col, id_col] + (columns or [c for c in ds.schema().names])
    ))
    coarse = 256

    def per_key_topk(t: pa.Table) -> pa.Table:
        """Keep ≤ k smallest (_rank, id) rows per key_col value — used as
        both the per-block combiner and the per-partition finisher."""
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), ("_rank", "ascending"),
                          (id_col, "ascending")]
        )
        t = t.take(idx)
        keys = t[key_col].combine_chunks()
        same = np.zeros(len(t), dtype=bool)
        if len(t) > 1:
            same[1:] = np.asarray(
                pc.equal(keys.slice(1), keys.slice(0, len(t) - 1))
            )
        # rank within key run: position − run start
        run_start = np.maximum.accumulate(
            np.where(~same, np.arange(len(t)), 0)
        )
        within = np.arange(len(t)) - run_start
        return t.filter(pa.array(within < k))

    def rank_and_combine(batch: pa.Table) -> pa.Table:
        batch = batch.select([c for c in keep if c in batch.column_names])
        ids = pc.cast(batch[id_col], pa.string())
        tmp = add_fingerprint_md5(pa.table({"text": ids}), out_col="_rank")
        batch = batch.append_column("_rank", tmp["_rank"])
        batch = per_key_topk(batch)
        kb = pc.cast(batch[key_col], pa.string()).combine_chunks()
        return batch.append_column(
            PART_COL,
            pa.array(hash_part(kb.to_numpy(zero_copy_only=False), coarse)),
        )

    def finish(group: pa.Table) -> pa.Table:
        return per_key_topk(group).drop_columns(["_rank", PART_COL])

    partials = ds.map_batches(
        rank_and_combine, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return partials.groupby(PART_COL).map_groups(
        finish, batch_format="pyarrow"
    )


def token_budget_sample(ds, key_col: str, budget: int,
                        size_col: str = "n_tok", id_col: str = "doc_id",
                        columns: list[str] | None = None):
    """Deterministic per-stratum sample by SIZE BUDGET instead of row
    count — the data-mixing primitive ("200 B tokens of web, 50 B of
    code"): each ``key_col`` group keeps its rows in ascending
    ``(md5(id), id)`` order while the running ``size_col`` sum stays ≤
    ``budget``.

    The selection order is engine-neutral md5 (the
    :func:`stratified_sample` contract), so any SQL system reproduces
    the exact sample with ``SUM(size) OVER (PARTITION BY key ORDER BY
    md5(id), id) <= budget`` — and because the running sum is monotone,
    the kept set is a PREFIX, which makes the per-block pre-filter a
    valid combiner: a row's block-local prefix sum never exceeds its
    global prefix sum, so every global winner survives the local pass.
    A hot stratum therefore ships O(budget/min_size) rows per block,
    never its row count.  One coarse keyed shuffle of the (narrow)
    survivors finishes the selection.
    """
    import pyarrow.compute as pc

    from log_formatter_ray.ops._shuffle import PART_COL, hash_part
    from log_formatter_ray.ops.textstats import add_fingerprint_md5

    keep = list(dict.fromkeys(
        [key_col, id_col, size_col]
        + (columns or [c for c in ds.schema().names])
    ))
    coarse = 256

    def per_key_budget(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"), ("_rank", "ascending"),
                          (id_col, "ascending")]
        )
        t = t.take(idx)
        keys = t[key_col].combine_chunks()
        same = np.zeros(len(t), dtype=bool)
        if len(t) > 1:
            same[1:] = np.asarray(
                pc.equal(keys.slice(1), keys.slice(0, len(t) - 1))
            )
        sizes = pc.cast(t[size_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        c = np.cumsum(sizes)
        run_start = np.maximum.accumulate(
            np.where(~same, np.arange(len(t)), 0)
        )
        base = (c - sizes)[run_start]  # prefix sum before each key run
        return t.filter(pa.array(c - base <= budget))

    def rank_and_combine(batch: pa.Table) -> pa.Table:
        batch = batch.select([c for c in keep if c in batch.column_names])
        ids = pc.cast(batch[id_col], pa.string())
        tmp = add_fingerprint_md5(pa.table({"text": ids}), out_col="_rank")
        batch = batch.append_column("_rank", tmp["_rank"])
        batch = per_key_budget(batch)
        kb = pc.cast(batch[key_col], pa.string()).combine_chunks()
        return batch.append_column(
            PART_COL,
            pa.array(hash_part(kb.to_numpy(zero_copy_only=False), coarse)),
        )

    def finish(group: pa.Table) -> pa.Table:
        return per_key_budget(group).drop_columns(["_rank", PART_COL])

    partials = ds.map_batches(
        rank_and_combine, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return partials.groupby(PART_COL).map_groups(
        finish, batch_format="pyarrow"
    )
