"""Decontamination (ops/decontam.py), word explode, and regex redaction:
vectorized kernels vs brute-force / DuckDB references."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from log_formatter_ray.ops.decontam import (
    _word_ngram_hashes,
    benchmark_ngram_hashes,
    decontaminate,
    flag_contaminated,
)
from log_formatter_ray.ops.dedup import _stable_hash64
from log_formatter_ray.ops.textstats import explode_words, redact_text

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _brute_ngrams(text: str, n: int) -> list[str]:
    ws = text.split(" ")
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


@pytest.mark.parametrize("n", [2, 3, 5])
def test_word_ngram_hashes_match_brute_force(n):
    texts = [
        "a b c d e",
        "x",                      # fewer than n words -> zero grams
        "",                       # one empty-string word
        "p q " + "r " * 20 + "s",
        "a b c d e",              # duplicate row
    ]
    h, row_off = _word_ngram_hashes(pa.array(texts), n)
    assert len(row_off) == len(texts) + 1
    for i, t in enumerate(texts):
        grams = _brute_ngrams(t, n)
        got = h[row_off[i]:row_off[i + 1]]
        assert len(got) == len(grams)
        if grams:
            np.testing.assert_array_equal(got, _stable_hash64(grams))


def test_word_ngram_hashes_on_sliced_batch():
    """A mid-table slice (non-zero-based list offsets) must hash the same
    grams as the full-table pass — the Ray block-slicing case."""
    t = pq.read_table(DOCS, columns=["text"])
    full_h, full_off = _word_ngram_hashes(t["text"], 3)
    s = t.slice(7, 11)
    h, off = _word_ngram_hashes(s["text"], 3)
    np.testing.assert_array_equal(h, full_h[full_off[7]:full_off[18]])


def test_flag_and_decontaminate_match_duckdb():
    docs = pq.read_table(DOCS)
    ds = rd.from_arrow(docs).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=None
    )

    def is_bench(b):
        return b.filter(pa.array(b["doc_id"].to_numpy(zero_copy_only=False) % 7 == 0))

    bench = rd.from_arrow(docs).map_batches(
        is_bench, batch_format="pyarrow", batch_size=None
    )
    grams = benchmark_ngram_hashes(bench, n=3)
    assert grams.dtype == np.uint64
    assert np.all(grams[:-1] <= grams[1:])  # sorted for searchsorted probes

    clean = decontaminate(
        rd.from_arrow(docs).map_batches(
            lambda b: b.filter(
                pa.array(b["doc_id"].to_numpy(zero_copy_only=False) % 7 != 0)),
            batch_format="pyarrow", batch_size=None),
        grams, n=3,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    want = con.execute("""
        WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        grams AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g
                  FROM corpus, UNNEST(generate_series(1, len(ws)-2)) AS t(i)),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0)
        SELECT doc_id FROM corpus
        WHERE doc_id % 7 <> 0 AND doc_id NOT IN (
            SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench b ON gr.g = b.g
            WHERE gr.doc_id % 7 <> 0)
        ORDER BY doc_id
    """).fetchdf()
    np.testing.assert_array_equal(clean["doc_id"].to_numpy(), want["doc_id"].to_numpy())


def test_flag_contaminated_empty_benchmark():
    ds = rd.from_items([{"doc_id": 1, "text": "a b c"}])
    out = flag_contaminated(ds, np.empty(0, dtype=np.uint64)).to_pandas()
    assert not out["contaminated"].any()


def test_explode_words_positions():
    t = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                  "text": pa.array(["a b c", "x y"])})
    out = explode_words(t).to_pandas()
    assert out["doc_id"].tolist() == [10, 10, 10, 11, 11]
    assert out["pos"].tolist() == [1, 2, 3, 1, 2]
    assert out["word"].tolist() == ["a", "b", "c", "x", "y"]


def test_explode_words_sliced_batch_matches_full():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    full = explode_words(t).to_pandas()
    part = explode_words(t.slice(3, 5)).to_pandas()
    sub = full[full["doc_id"].isin(part["doc_id"])].reset_index(drop=True)
    assert part.equals(sub)


def test_redact_matches_duckdb():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    got = redact_text(t).to_pandas()[["doc_id", "redacted", "n_redacted"]]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    want = con.execute(r"""
        SELECT doc_id, regexp_replace(text, '\b(key|hash)\b', '<TERM>', 'g') AS redacted,
               CAST(len(regexp_extract_all(text, '\b(key|hash)\b')) AS BIGINT) AS n_redacted
        FROM documents
    """).fetchdf()
    assert got.equals(want)


def test_token_ngram_hashes_window_semantics():
    """Token n-gram windows: exact count per row, boundary windows never
    cross rows, identical windows hash identically, sliced batches agree."""
    import numpy as np

    from log_formatter_ray.ops.decontam import _token_ngram_hashes

    t = pa.array(
        [[1, 2, 3, 4], [1, 2, 3], [5], [], [2, 3, 4, 1, 2, 3]],
        pa.list_(pa.int32()),
    )
    h, off = _token_ngram_hashes(t, n=3)
    assert np.diff(off).tolist() == [2, 1, 0, 0, 4]
    # row0 window [2,3,4] == row4 window [2,3,4]; row0 [1,2,3] == row1's
    assert h[1] == h[off[4]]
    assert h[0] == h[2]
    assert h[0] != h[1]
    # slicing the ListArray must not change any hash (flatten contract)
    h_sl, off_sl = _token_ngram_hashes(t.slice(1, 3), n=3)
    assert h_sl.tolist() == h[2:3].tolist()
    assert np.diff(off_sl).tolist() == [1, 0, 0]


def test_decontaminate_tokens_drops_overlaps():
    import numpy as np

    import ray.data as rd

    from log_formatter_ray.ops.decontam import (
        benchmark_token_ngram_hashes,
        decontaminate_tokens,
        flag_contaminated_tokens,
    )

    rng = np.random.default_rng(3)
    rows = []
    eval_rows = []
    for i in range(50):
        toks = rng.integers(0, 50_000, size=24).astype(np.int32).tolist()
        rows.append({"doc_id": i, "tokens": toks})
        if i % 10 == 0:
            eval_rows.append({"doc_id": 1000 + i, "tokens": toks[5:15]})
    # a clean eval row shares no 8-gram with the corpus
    eval_rows.append(
        {"doc_id": 2000,
         "tokens": rng.integers(60_000, 70_000, size=12).astype(np.int32).tolist()}
    )
    corpus = rd.from_items(rows).repartition(3)
    bench = rd.from_items(eval_rows).repartition(2)
    hashes = benchmark_token_ngram_hashes(bench, n=8)
    kept = decontaminate_tokens(corpus, hashes, n=8).to_pandas()
    contaminated = {i for i in range(50) if i % 10 == 0}
    assert set(kept["doc_id"]) == set(range(50)) - contaminated
    flags = flag_contaminated_tokens(corpus, hashes, n=8).to_pandas()
    assert set(flags.loc[flags["contaminated"], "doc_id"]) == contaminated
    # short rows (< n tokens) are never contaminated
    short = rd.from_items([{"doc_id": 99, "tokens": [1, 2, 3]}])
    assert decontaminate_tokens(short, hashes, n=8).count() == 1


def test_contamination_counts_tokens_exact_counts():
    import numpy as np

    import ray.data as rd

    from log_formatter_ray.ops.decontam import (
        benchmark_token_ngram_hashes,
        contamination_counts_tokens,
    )

    # doc "hit2": eval gram [10..17] appears at positions 0 and 4 after a
    # 4-token gap?  Construct explicitly: two occurrences of the eval
    # 8-gram, one unrelated doc, one short doc.
    gram = list(range(10, 18))
    rows = [
        {"doc_id": "hit2", "tokens": gram + [99, 98] + gram},
        {"doc_id": "miss", "tokens": list(range(200, 220))},
        {"doc_id": "short", "tokens": [1, 2, 3]},
    ]
    bench = rd.from_items([{"doc_id": "e", "tokens": gram}])
    hashes = benchmark_token_ngram_hashes(bench, n=8)
    out = contamination_counts_tokens(
        rd.from_items(rows).repartition(2), hashes, n=8
    ).to_pandas().set_index("doc_id")
    assert out.loc["hit2", "n_grams"] == 18 - 8 + 1
    assert out.loc["hit2", "n_hit"] == 2
    assert out.loc["miss", "n_grams"] == 13 and out.loc["miss", "n_hit"] == 0
    assert out.loc["short", "n_grams"] == 0 and out.loc["short", "n_hit"] == 0
