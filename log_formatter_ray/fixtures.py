"""Deterministic synthetic corpora (FIXTURES.md).

The primary input table is ``sequences`` — the shape mandated by
BASELINE.json ``input_hint``:

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

It is the bounded analog of the reference's homogeneous Kafka topic of log
docs (/root/reference/deployment/README.md:3).  Generation is fully
deterministic (numpy ``default_rng`` seeded per file) so any two runs — and
any two parallelism levels — see byte-identical input.

Generation is seeded *per file* so files can be produced independently and
a corpus can be grown file-by-file without re-reading earlier files.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# 12 source names, Zipf-skewed (FIXTURES.md §1) to exercise salted/partial
# aggregation. "misc" deliberately has no entry in the enrich lookup (§2).
SOURCE_NAMES = [
    "web", "books", "code", "wiki", "news", "social",
    "forum", "academic", "legal", "mail", "chat", "misc",
]

DAYS = [f"2020-11-{13 + d:02d}" for d in range(14)]  # 14 consecutive dates

VOCAB_SIZE = 50_257
MIN_LEN, MAX_LEN = 16, 2048

SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _zfill_widen(ints: np.ndarray, width: int) -> np.ndarray:
    """Zero-pad to ``width`` but WIDEN for longer numbers — ``np.char.zfill``
    silently truncates strings longer than ``width`` (shard ≥ 10^4 /
    seq ≥ 10^8 would corrupt doc_ids at design scale)."""
    s = ints.astype(str).astype(object)
    lens = np.char.str_len(s.astype(str))
    zeros = np.array(["0" * i for i in range(width + 1)], dtype=object)
    return zeros[np.clip(width - lens, 0, None)] + s


def _zipf_weights(n: int, a: float = 1.5) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def make_sequences_batch(
    num_rows: int, start_row: int, seed: int = 42, malformed_every: int = 50
) -> pa.Table:
    """One deterministic chunk of the ``sequences`` table.

    ``start_row`` gives globally unique ``seq`` numbers; the rng is seeded
    with ``(seed, start_row)`` so each chunk is reproducible in isolation.
    A corpus is identified by its full spec ``(num_rows, num_files, seed)``
    — chunk contents depend on chunk boundaries (numpy's choice/lognormal
    draws are not prefix-stable), which is why ``generate_sequences`` keys
    its completion marker on the full spec.

    ~2% of doc_ids (row index ≡ 17 mod ``malformed_every``) are malformed
    (missing a ``/`` segment) to exercise the parser's drop /
    ``error_tolerant`` paths (reference drop semantics:
    /root/reference/agent/pipeline/pipeline.go:158-167).
    """
    rng = np.random.default_rng([seed, start_row])
    rows = np.arange(start_row, start_row + num_rows)

    src_idx = rng.choice(len(SOURCE_NAMES), size=num_rows, p=_zipf_weights(len(SOURCE_NAMES)))
    day_idx = rng.integers(0, len(DAYS), size=num_rows)
    shard = rows // 1000

    sources = np.array(SOURCE_NAMES, dtype=object)[src_idx]
    days = np.array(DAYS, dtype=object)[day_idx]

    # doc_id = "{source}/{day}/{shard:04d}-{seq:08d}"; malformed rows drop the
    # day segment → the grok pattern cannot match.
    malformed = (rows % malformed_every) == 17
    shard_seq = (
        _zfill_widen(shard, 4) + "-" + _zfill_widen(rows, 8)
    )
    ok_ids = sources + "/" + days + "/" + shard_seq
    bad_ids = sources + "/" + shard_seq
    doc_id = np.where(malformed, bad_ids, ok_ids)

    # token lengths ~ clipped lognormal(6, 0.6) in [16, 2048]
    lens = np.clip(rng.lognormal(6.0, 0.6, size=num_rows), MIN_LEN, MAX_LEN).astype(np.int64)
    total = int(lens.sum())
    values = rng.integers(0, VOCAB_SIZE, size=total, dtype=np.int32)
    offsets = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    # list<int32> carries int32 offsets; past 2^31 total tokens per chunk the
    # cast would wrap negative and corrupt the ListArray — fail loudly (split
    # the corpus into more files instead of widening the schema).
    if total >= 2**31:
        raise ValueError(
            f"chunk of {total} tokens overflows int32 list offsets; "
            "generate with more files so each chunk stays under 2^31 tokens"
        )
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), pa.array(values)
    )

    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(sources, pa.string()),
        },
        schema=SEQUENCES_SCHEMA,
    )


def generate_sequences(
    out_dir: str, num_rows: int, num_files: int = 8, seed: int = 42
) -> list[str]:
    """Write the ``sequences`` corpus as ``num_files`` parquet shards.

    File shards play the role of Kafka topic partitions
    (/root/reference/agent/input/kafka/kafka.go:90-126): they are the unit
    of input parallelism AND the unit of resume lineage (state/manifest.py).
    Idempotent: existing complete corpus dirs are reused (marker file).
    """
    marker = os.path.join(out_dir, f"_COMPLETE_{num_rows}_{num_files}_{seed}")
    files = [os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(num_files)]
    if os.path.exists(marker):
        return files
    os.makedirs(out_dir, exist_ok=True)
    # A different spec previously wrote here: wipe stale shards/markers so a
    # glob of the directory never mixes two corpora.
    for name in os.listdir(out_dir):
        if name.startswith(("part-", "_COMPLETE_")):
            os.remove(os.path.join(out_dir, name))
    per_file = num_rows // num_files
    start = 0
    for i, path in enumerate(files):
        n = per_file if i < num_files - 1 else num_rows - per_file * (num_files - 1)
        table = make_sequences_batch(n, start_row=start, seed=seed)
        pq.write_table(table, path)
        start += n
    with open(marker, "w") as f:
        f.write("ok\n")
    return files


def make_spanful_sequences(
    num_rows: int, span_gram: int = 12, seed: int = 43
) -> pa.Table:
    """A sequences-shaped corpus with PLANTED duplicated token spans — the
    ground truth for exact-substring dedup (ops/substr.py), where the
    uniform-random main corpus would contain no >= L repeats at all.

    Base docs are uniform tokens over a 1000-token vocab (lengths 40–240);
    then, deterministically:

    - every 7th doc donates a span of length ``span_gram``–``3*span_gram``
      that is copied verbatim into doc ``i+3`` (cross-document duplicate);
    - every 13th doc has an internal span repeated later in the SAME doc
      (within-document duplicate).

    Some spans overlap or chain (a copied span can itself be partially
    re-copied) — exactly the messy union-of-windows cases the operator
    must handle.  ``doc_id`` is ``span-%06d`` so the (id, pos) election
    order is the plain string order on both the Ray and SQL sides.
    """
    rng = np.random.default_rng([seed, num_rows])
    L = int(span_gram)
    lens = rng.integers(40, 241, size=num_rows).astype(np.int64)
    toks = [rng.integers(0, 1000, size=int(n), dtype=np.int32)
            for n in lens]
    for i in range(0, num_rows, 7):
        j = (i + 3) % num_rows
        if j == i:
            continue
        src, dst = toks[i], toks[j]
        m = int(rng.integers(L, 3 * L + 1))
        m = min(m, len(src), len(dst))
        if m < L:
            continue
        a = int(rng.integers(0, len(src) - m + 1))
        b = int(rng.integers(0, len(dst) - m + 1))
        dst[b:b + m] = src[a:a + m]
    for i in range(0, num_rows, 13):
        t = toks[i]
        m = int(rng.integers(L, 2 * L + 1))
        if len(t) < 2 * m:
            continue
        a = int(rng.integers(0, len(t) // 2 - m + 1))
        b = int(rng.integers(len(t) // 2, len(t) - m + 1))
        t[b:b + m] = t[a:a + m]
    flat = np.concatenate(toks) if toks else np.zeros(0, np.int32)
    off = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(off.astype(np.int32), pa.int32()), pa.array(flat, pa.int32())
    )
    doc_id = np.array([f"span-{i:06d}" for i in range(num_rows)], dtype=object)
    src_idx = rng.choice(
        len(SOURCE_NAMES), size=num_rows, p=_zipf_weights(len(SOURCE_NAMES))
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(
                np.array(SOURCE_NAMES, dtype=object)[src_idx], pa.string()
            ),
        },
        schema=SEQUENCES_SCHEMA,
    )


def generate_spanful_sequences(
    out_dir: str, num_rows: int, num_files: int = 8, span_gram: int = 12,
    seed: int = 43,
) -> list[str]:
    """Shard :func:`make_spanful_sequences` to parquet (idempotent, marker-
    keyed on the full spec like :func:`generate_sequences`).  The corpus is
    generated as ONE table (planting is cross-document) and sliced —
    spanful corpora are small ground-truth sets, not the bulk corpus."""
    marker = os.path.join(
        out_dir, f"_COMPLETE_{num_rows}_{num_files}_{span_gram}_{seed}"
    )
    files = [os.path.join(out_dir, f"part-{i:05d}.parquet")
             for i in range(num_files)]
    if os.path.exists(marker):
        return files
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name.startswith(("part-", "_COMPLETE_")):
            os.remove(os.path.join(out_dir, name))
    table = make_spanful_sequences(num_rows, span_gram=span_gram, seed=seed)
    per_file = num_rows // num_files
    start = 0
    for i, path in enumerate(files):
        n = per_file if i < num_files - 1 else num_rows - per_file * (
            num_files - 1)
        pq.write_table(table.slice(start, n), path)
        start += n
    with open(marker, "w") as f:
        f.write("ok\n")
    return files


# ---------------------------------------------------------------------------
# Enrichment lookup (FIXTURES.md §2) — the broadcast small side, the analog of
# the reference's static-label merge generalized to a translate dict
# (/root/reference/agent/pipeline/pipeline.go:169-171).
# ---------------------------------------------------------------------------

_TIERS = ["premium", "standard", "raw"]


def make_source_lookup() -> pa.Table:
    """source → (tier, weight); deliberately no row for "misc" (miss → null)."""
    names = [s for s in SOURCE_NAMES if s != "misc"]
    tiers = [_TIERS[i % 3] for i in range(len(names))]
    weights = [round(1.0 / (i + 1), 4) for i in range(len(names))]
    return pa.table(
        {
            "source": pa.array(names, pa.string()),
            "tier": pa.array(tiers, pa.string()),
            "weight": pa.array(weights, pa.float64()),
        }
    )


def make_golden_messages() -> pa.Table:
    """The reference's e2e golden corpus, replicated
    (/root/reference/test/input-test.txt: 63 lines of
    "YYYY-MM-DD HH:MM:SS hello world", 1 s apart)."""
    import datetime

    t0 = datetime.datetime(2020, 11, 13, 11, 28, 5)
    lines = [
        (t0 + datetime.timedelta(seconds=i)).strftime("%Y-%m-%d %H:%M:%S") + " hello world"
        for i in range(63)
    ]
    return pa.table({"message": pa.array(lines, pa.string())})
