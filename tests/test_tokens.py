"""Token-sequence ops: chunking (byte-exact reassembly), packing
(capacity + coverage invariants), histogram (numpy oracle)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from log_formatter_ray.ops.tokens import (
    chunk_sequences,
    chunk_sequences_overlap,
    pack_sequences,
    token_histogram,
)


def test_chunk_sequences_reassembles_byte_exact(seq_batch):
    out = chunk_sequences(seq_batch, max_len=100)
    # every chunk ≤ 100, n_tok invariant holds
    lens = pa.compute.list_value_length(out["tokens"]).to_pylist()
    assert max(lens) <= 100
    assert lens == out["n_tok"].to_pylist()
    # reassembling chunks in order reproduces the original tokens exactly
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"])
    rebuilt = {
        d: np.concatenate([np.asarray(t) for t in g["tokens"]])
        for d, g in df.groupby("doc_id", sort=False)
    }
    orig = seq_batch.to_pandas()
    for d, toks in zip(orig["doc_id"], orig["tokens"]):
        assert np.array_equal(rebuilt[d], np.asarray(toks))
    # chunk count = ceil(n_tok / 100)
    expected_chunks = int(sum((n + 99) // 100 for n in orig["n_tok"]))
    assert len(out) == expected_chunks


def test_chunk_sequences_in_pipeline(seq_batch):
    ds = rd.from_arrow(seq_batch).repartition(3)
    out = ds.map_batches(
        lambda b: chunk_sequences(b, max_len=256), batch_format="pyarrow",
        batch_size=None,
    )
    total = out.to_pandas()
    assert total["n_tok"].sum() == seq_batch.to_pandas()["n_tok"].sum()


def test_chunk_overlap_values_match_brute_force(seq_batch):
    W, S = 100, 40
    out = chunk_sequences_overlap(seq_batch, window=W, stride=S)
    df = out.to_pandas()
    orig = {d: np.asarray(t, np.int64)
            for d, t in zip(seq_batch["doc_id"].to_pylist(),
                            seq_batch["tokens"].to_pylist())}
    # brute force: starts 0, S, 2S, ... stop at the first window reaching
    # the end; every chunk's values equal the original slice
    expected = {}
    for d, t in orig.items():
        n = len(t)
        starts = [0]
        while starts[-1] + W < n:
            starts.append(starts[-1] + S)
        expected[d] = [t[s:s + W] for s in starts]
    seen = {d: 0 for d in orig}
    for _, r in df.sort_values(["doc_id", "chunk_idx"]).iterrows():
        d, j = r["doc_id"], int(r["chunk_idx"])
        assert np.array_equal(np.asarray(r["tokens"], np.int64),
                              expected[d][j]), (d, j)
        assert r["n_tok"] == len(expected[d][j])
        seen[d] += 1
    assert all(seen[d] == len(expected[d]) for d in orig)


def test_chunk_overlap_stride_equals_window_matches_chunk_sequences():
    t = pa.table({
        "doc_id": pa.array(["a", "b", "c"], pa.string()),
        "tokens": pa.array([list(range(7)), [], list(range(13))],
                           pa.list_(pa.int32())),
    })
    a = chunk_sequences_overlap(t, window=5, stride=5).to_pandas()
    b = chunk_sequences(t, max_len=5).to_pandas()
    key = ["doc_id", "chunk_idx"]
    a, b = a.sort_values(key).reset_index(drop=True), \
        b.sort_values(key).reset_index(drop=True)
    assert a["n_tok"].tolist() == b["n_tok"].tolist()
    for x, y in zip(a["tokens"], b["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_chunk_overlap_sliced_batch_and_pipeline():
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(40)], pa.string()),
        "tokens": pa.array([list(range(i * 3)) for i in range(40)],
                           pa.list_(pa.int32())),
    })
    whole = chunk_sequences_overlap(t, window=16, stride=8).to_pandas()
    part = chunk_sequences_overlap(t.slice(10, 20), window=16,
                                   stride=8).to_pandas()
    sub = whole[whole["doc_id"].isin(part["doc_id"])].reset_index(drop=True)
    part = part.reset_index(drop=True)
    assert sub["n_tok"].tolist() == part["n_tok"].tolist()
    for x, y in zip(sub["tokens"], part["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    # and through a Dataset with a different block layout
    ds = rd.from_arrow(t).repartition(7).map_batches(
        lambda b: chunk_sequences_overlap(b, window=16, stride=8),
        batch_format="pyarrow", batch_size=None,
    )
    df = ds.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(
        drop=True)
    w = whole.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert df["n_tok"].tolist() == w["n_tok"].tolist()


def test_pack_sequences_invariants(seq_batch):
    ctx = 2048
    out = pack_sequences(seq_batch, context_len=ctx)
    df = out.to_pandas()
    # capacity: every pack fits the context
    assert (df["n_tok"] <= ctx).all()
    # coverage: every doc appears exactly once
    all_ids = [d for ids in df["doc_ids"] for d in ids]
    assert sorted(all_ids) == sorted(seq_batch["doc_id"].to_pylist())
    # token conservation (no doc exceeds ctx in this fixture: max 2048)
    assert df["n_tok"].sum() == seq_batch.to_pandas()["n_tok"].sum()
    # boundaries mark suffix offsets of each member
    row = df.iloc[0]
    assert row["boundaries"][-1] == row["n_tok"]
    assert len(row["boundaries"]) == row["n_seqs"]
    # packing actually packs (fewer rows than docs)
    assert len(df) < len(seq_batch)
    # fill rate sanity: average fill ≥ 70% of context
    assert df["n_tok"].mean() >= 0.7 * ctx


def test_pack_truncates_overlong():
    t = pa.table(
        {
            "doc_id": ["a"],
            "tokens": [list(range(3000))],
        }
    )
    out = pack_sequences(t, context_len=1000)
    assert out["n_tok"].to_pylist() == [1000]


def test_unpack_sequences_roundtrip(seq_batch):
    from log_formatter_ray.ops.tokens import unpack_sequences

    packs = pack_sequences(seq_batch, context_len=2048)
    seqs = unpack_sequences(packs).to_pandas()
    orig = seq_batch.to_pandas().set_index("doc_id")
    assert sorted(seqs["doc_id"]) == sorted(orig.index)
    for d, toks in zip(seqs["doc_id"], seqs["tokens"]):
        assert np.array_equal(np.asarray(toks), np.asarray(orig.loc[d, "tokens"]))
    # filtered (non-tiling start) subset exercises the fallback/tile check
    sub = packs.slice(1, len(packs) - 1)
    seqs2 = unpack_sequences(sub).to_pandas()
    for d, toks in zip(seqs2["doc_id"], seqs2["tokens"]):
        assert np.array_equal(np.asarray(toks), np.asarray(orig.loc[d, "tokens"]))
    # truncation survives the roundtrip
    t = pa.table({"doc_id": ["a", "b"], "tokens": [list(range(3000)), [7, 8]]})
    rt = unpack_sequences(pack_sequences(t, context_len=1000)).to_pandas()
    rt = rt.set_index("doc_id")
    assert list(rt.loc["a", "tokens"]) == list(range(1000))
    assert list(rt.loc["b", "tokens"]) == [7, 8]
    # empty input keeps a typed schema
    empty = unpack_sequences(packs.slice(0, 0))
    assert empty.schema.field("tokens").type == pa.list_(pa.int32())


def test_pack_sequences_spill_global_fill(tmp_path):
    """Two-level pack-and-spill: every sequence packed exactly once, mass
    conserved, and the global fill is at least the per-batch fill (the
    refine stage exists to beat the per-window tail loss)."""
    import pyarrow.parquet as pq

    from log_formatter_ray.fixtures import make_sequences_batch
    from log_formatter_ray.ops.tokens import pack_sequences_spill

    ctx = 2048
    batch = make_sequences_batch(6000, start_row=0)
    ds = rd.from_arrow(batch).repartition(12)  # 12 per-batch windows
    res = pack_sequences_spill(
        ds, str(tmp_path), context_len=ctx, refine_partitions=2
    )
    df = batch.to_pandas()
    expected_tokens = int(np.minimum(df["n_tok"], ctx).sum())
    assert res["n_seqs"] == len(batch)
    assert res["total_tokens"] == expected_tokens

    out = pq.read_table(res["path"])
    all_ids = [d for ids in out["doc_ids"].to_pylist() for d in ids]
    assert sorted(all_ids) == sorted(batch["doc_id"].to_pylist())
    assert (np.asarray(out["n_tok"]) <= ctx).all()

    # per-batch packing fill over the same 12 windows (no refine)
    per_batch_packs = 0
    for i in range(12):
        sl = batch.slice(i * 500, 500)
        per_batch_packs += len(pack_sequences(sl, context_len=ctx))
    per_batch_fill = expected_tokens / (per_batch_packs * ctx)
    assert res["n_packs"] <= per_batch_packs
    assert res["fill"] >= per_batch_fill
    assert res["fill"] >= 0.99


def test_token_histogram_matches_numpy(seq_batch):
    ds = rd.from_arrow(seq_batch).repartition(4)
    hist = token_histogram(ds, vocab_size=50257)
    flat = np.concatenate([np.asarray(t) for t in seq_batch.to_pandas()["tokens"]])
    expected = np.bincount(flat, minlength=50257)
    assert np.array_equal(hist, expected)
    assert hist.sum() == seq_batch.to_pandas()["n_tok"].sum()


def test_token_histogram_out_of_range_ids_dropped():
    t = pa.table(
        {"tokens": pa.array([[1, 2, 99], [-5, 2]], pa.list_(pa.int32()))}
    )
    hist = token_histogram(rd.from_arrow(t), vocab_size=10)
    assert hist.shape == (10,)
    assert hist[1] == 1 and hist[2] == 2
    assert hist.sum() == 3  # 99 and -5 dropped, no crash


def test_sequence_hash128_sliced_listarray():
    """ADVICE r4: a SLICED ListArray's ``.values`` is the full unsliced
    child — hashing a slice must equal hashing the same rows standalone
    (the batch-slicing path Ray takes below batch_size=None)."""
    from log_formatter_ray.ops.tokens import _sequence_hash128

    tokens = pa.array(
        [[1, 2, 3], [4], [5, 6], [], [7, 8, 9, 10]], pa.list_(pa.int32())
    )
    h1_all, h2_all = _sequence_hash128(tokens)
    sl = tokens.slice(1, 3)
    h1_sl, h2_sl = _sequence_hash128(sl)
    assert np.array_equal(h1_sl, h1_all[1:4])
    assert np.array_equal(h2_sl, h2_all[1:4])


def test_pack_sequences_spill_empty_input(tmp_path):
    """An empty (or fully-filtered) input is a valid no-op: zero stats,
    no crash on the empty output directory."""
    from log_formatter_ray.ops.tokens import pack_sequences_spill

    t = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
        }
    )
    res = pack_sequences_spill(rd.from_arrow(t), str(tmp_path))
    assert res["n_packs"] == 0 and res["n_seqs"] == 0
    assert res["total_tokens"] == 0 and res["fill"] == 0.0


def test_token_histogram_tree_reduce_invariant(seq_batch):
    """VERDICT r3 item 7: the tree reduce (fused first level + repartition
    + second level) must give the identical histogram for any reduce
    shape."""
    ds = rd.from_arrow(seq_batch).repartition(16)
    base = token_histogram(ds, vocab_size=50257)
    narrow = token_histogram(ds, vocab_size=50257, reduce_width=2,
                             merge_batch=3)
    assert np.array_equal(base, narrow)


def test_dedup_sequences_exact_and_byte_exact():
    """Token-sequence exact dedup: keep min-id per distinct sequence,
    byte-exact payload through the pyarrow-only group stage; length
    matters ([1,2] != [1,2,0]) and prefix-sharing rows stay distinct."""
    from log_formatter_ray.ops.tokens import dedup_sequences

    rows = [
        (0, [1, 2, 3]),
        (1, [1, 2, 3]),       # dup of 0
        (2, [1, 2]),          # prefix, distinct
        (3, [1, 2, 0]),       # shares prefix + extra zero, distinct
        (4, []),              # empty
        (5, []),              # dup empty
        (6, [7] * 1500),      # long
        (7, [7] * 1500),      # dup long
        (8, [7] * 1499),      # near-long, distinct
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    got = dedup_sequences(ds, coarse=8).to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 2, 3, 4, 6, 8]
    by_id = {r[0]: r[1] for r in rows}
    for _, row in got.iterrows():
        assert list(row["tokens"]) == by_id[row["doc_id"]]  # byte-exact


def _decode_span_corrupt(inputs, targets, sentinel_floor):
    """Reconstruct the original sequence from a (inputs, targets) pair."""
    spans, cur = {}, None
    for t in targets:
        if t >= sentinel_floor:
            cur = t
            spans.setdefault(cur, [])
        else:
            spans[cur].append(t)
    out = []
    for t in inputs:
        if t >= sentinel_floor:
            out.extend(spans[t])
        else:
            out.append(t)
    return out


def test_span_corrupt_round_trips_and_is_slice_invariant():
    from log_formatter_ray.ops.tokens import span_corrupt_sequences

    rng = np.random.default_rng(8)
    rows = [rng.integers(0, 1000, size=L).astype(np.int32).tolist()
            for L in (0, 1, 2, 40, 200, 7, 500)]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
        "tokens": pa.array(rows, pa.list_(pa.int32())),
    })
    out = span_corrupt_sequences(t, sentinel_base=50_256)
    floor = 50_256 - 2000
    masked_total = 0
    for i, orig in enumerate(rows):
        inp = out["inputs"][i].as_py()
        tgt = out["targets"][i].as_py()
        assert _decode_span_corrupt(inp, tgt, floor) == orig, i
        n_sent = sum(1 for x in inp if x >= floor)
        masked_total += len(orig) - (len(inp) - n_sent)
        if n_sent:
            # targets: k run sentinels + closing, descending from base
            sents = [x for x in tgt if x >= floor]
            assert sents == list(range(50_256, 50_256 - n_sent - 1, -1))
        else:
            assert tgt == []
    # ~15% of the 750 tokens masked (loose band: hash-random)
    assert 0.05 < masked_total / 750 < 0.35

    # slice invariance: same rows, sliced batch
    part = span_corrupt_sequences(t.slice(3, 3), sentinel_base=50_256)
    assert part["inputs"].to_pylist() == out["inputs"].to_pylist()[3:6]
    assert part["targets"].to_pylist() == out["targets"].to_pylist()[3:6]


def test_span_corrupt_spans_never_cross_rows():
    """Identical tokens + identical ids would mask identically; DISTINCT
    ids give independent masks, and every row decodes independently."""
    from log_formatter_ray.ops.tokens import span_corrupt_sequences

    base = list(range(100))
    t = pa.table({
        "doc_id": pa.array(["a", "b"]),
        "tokens": pa.array([base, base], pa.list_(pa.int32())),
    })
    out = span_corrupt_sequences(t, sentinel_base=50_256)
    floor = 50_256 - 2000
    for i in range(2):
        assert _decode_span_corrupt(
            out["inputs"][i].as_py(), out["targets"][i].as_py(), floor
        ) == base
    # distinct doc ids -> distinct PRN streams
    assert out["inputs"][0].as_py() != out["inputs"][1].as_py()


def test_remap_tokens_gather_and_guards():
    from log_formatter_ray.ops.tokens import remap_tokens

    lut = np.arange(100, dtype=np.int32)[::-1].copy()  # id -> 99-id
    t = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "tokens": pa.array([[0, 5, 99], [], [42]], pa.list_(pa.int32())),
    })
    out = remap_tokens(t, lut)
    assert out["tokens"].to_pylist() == [[99, 94, 0], [], [57]]
    # sliced batch maps the same rows
    part = remap_tokens(t.slice(2, 1), lut)
    assert part["tokens"].to_pylist() == [[57]]
    # out-of-range id fails loudly
    bad = pa.table({
        "doc_id": pa.array(["x"]),
        "tokens": pa.array([[100]], pa.list_(pa.int32())),
    })
    with pytest.raises(ValueError, match="outside LUT range"):
        remap_tokens(bad, lut)
    # out_col keeps the original column
    both = remap_tokens(t, lut, out_col="tokens_new")
    assert both["tokens"].to_pylist()[0] == [0, 5, 99]
    assert both["tokens_new"].to_pylist()[0] == [99, 94, 0]


def test_bpe_pair_counts_matches_brute_force():
    from log_formatter_ray.ops.tokens import bpe_pair_counts

    rng = np.random.default_rng(19)
    rows = [rng.integers(0, 30, size=rng.integers(0, 40)).tolist()
            for _ in range(200)]
    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "tokens": pa.array(rows, pa.list_(pa.int32())),
    })
    import collections
    brute = collections.Counter()
    for r in rows:
        for x, y in zip(r, r[1:]):
            brute[(x, y)] += 1
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    for parts in (1, 6):
        got = bpe_pair_counts(
            rd.from_arrow(t).repartition(parts), k=15, coarse=7
        ).to_pandas()
        assert [((a, b), n) for a, b, n in
                zip(got["a"], got["b"], got["n"])] == want


def test_add_pack_masks_block_diagonal_layout():
    from log_formatter_ray.ops.tokens import add_pack_masks, pack_sequences

    t = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "tokens": pa.array([[1, 2, 3], [4, 5], [6]], pa.list_(pa.int32())),
    })
    packed = pack_sequences(t, context_len=4)
    out = add_pack_masks(packed, context_len=4, pad_id=0)
    ids = out["input_ids"].to_pylist()
    didx = out["doc_index"].to_pylist()
    lm = out["loss_mask"].to_pylist()
    assert ids == [[1, 2, 3, 6], [4, 5, 0, 0]]
    assert didx == [[0, 0, 0, 1], [0, 0, -1, -1]]
    assert lm == [[1, 1, 1, 1], [1, 1, 0, 0]]
    # sliced batches behave identically
    part = add_pack_masks(packed.slice(1, 1), context_len=4)
    assert part["doc_index"].to_pylist() == [[0, 0, -1, -1]]
    # overlong pack fails loudly
    with pytest.raises(ValueError, match="context_len"):
        add_pack_masks(packed, context_len=3)


def test_fim_transform_round_trips_and_is_slice_invariant():
    from log_formatter_ray.ops.tokens import fim_transform

    PRE, SUF, MID = 50_254, 50_255, 50_256
    rng = np.random.default_rng(31)
    rows = [rng.integers(0, 1000, size=ln).astype(np.int32).tolist()
            for ln in (0, 1, 5, 80, 200, 2, 40, 40, 40, 40)]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
        "tokens": pa.array(rows, pa.list_(pa.int32())),
    })
    out = fim_transform(t, fim_rate=0.7, pre_id=PRE, suf_id=SUF, mid_id=MID)
    applied = out["fim_applied"].to_pylist()
    assert any(applied) and not all(applied)  # both paths exercised
    for i, orig in enumerate(rows):
        got = out["tokens"][i].as_py()
        if not applied[i]:
            assert got == orig
            continue
        assert len(got) == len(orig) + 3
        assert got[0] == PRE
        s = got.index(SUF)
        m = got.index(MID)
        prefix, suffix, middle = got[1:s], got[s + 1:m], got[m + 1:]
        assert prefix + middle + suffix == orig, i

    part = fim_transform(t.slice(3, 4), fim_rate=0.7,
                         pre_id=PRE, suf_id=SUF, mid_id=MID)
    assert part["tokens"].to_pylist() == out["tokens"].to_pylist()[3:7]
    assert part["fim_applied"].to_pylist() == applied[3:7]
