import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from log_formatter_ray.fixtures import (
    SEQUENCES_SCHEMA,
    SOURCE_NAMES,
    generate_sequences,
    make_golden_messages,
    make_sequences_batch,
    make_source_lookup,
)


def test_schema_matches_input_hint(seq_batch):
    # BASELINE.json input_hint: (doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
    assert seq_batch.schema.equals(SEQUENCES_SCHEMA)
    assert seq_batch.schema.field("tokens").type == pa.list_(pa.int32())
    assert seq_batch.schema.field("n_tok").type == pa.int32()


def test_deterministic(seq_batch):
    again = make_sequences_batch(1000, start_row=0)
    assert seq_batch.equals(again)


def test_n_tok_invariant(seq_batch):
    lens = pa.compute.list_value_length(seq_batch["tokens"])
    assert pa.compute.all(
        pa.compute.equal(lens.cast(pa.int32()), seq_batch["n_tok"])
    ).as_py()


def test_malformed_rate(seq_batch):
    # rows ≡ 17 (mod 50) are malformed → exactly 2%
    bad = [d for d in seq_batch["doc_id"].to_pylist() if d.count("/") != 2]
    assert len(bad) == 20


def test_source_skew(seq_batch):
    counts = collections.Counter(seq_batch["source"].to_pylist())
    # Zipf: head source dominates the tail source heavily
    assert counts["web"] > 5 * counts.get("misc", 1)
    assert set(counts) <= set(SOURCE_NAMES)


def test_generate_files_idempotent(corpus_dir):
    files = generate_sequences(corpus_dir, 5000, num_files=4)
    assert len(files) == 4
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 5000
    # second call returns the same corpus without rewriting
    files2 = generate_sequences(corpus_dir, 5000, num_files=4)
    assert files == files2


def test_source_lookup_misses_misc():
    lk = make_source_lookup()
    assert "misc" not in lk["source"].to_pylist()
    assert set(lk.column_names) == {"source", "tier", "weight"}


def test_golden_messages_reference_corpus():
    # replica of /root/reference/test/input-test.txt: 63 lines, 1 s apart
    t = make_golden_messages()
    assert len(t) == 63
    msgs = t["message"].to_pylist()
    assert msgs[0] == "2020-11-13 11:28:05 hello world"
    assert msgs[-1] == "2020-11-13 11:29:07 hello world"


def test_doc_ids_widen_past_fixed_digits():
    # shard ≥ 10^4 and seq ≥ 10^8 must widen, not truncate (U4/U8 trap)
    b = make_sequences_batch(3, start_row=99_999_999, malformed_every=10**9)
    ids = b["doc_id"].to_pylist()
    seqs = [d.rsplit("-", 1)[1] for d in ids]
    assert seqs == ["99999999", "100000000", "100000001"]
    shards = [d.rsplit("/", 1)[1].split("-")[0] for d in ids]
    assert shards[0] == "99999" and len(set(ids)) == 3
