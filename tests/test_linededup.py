"""Corpus-wide duplicate-line removal (ops/linededup.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from log_formatter_ray.ops.linededup import global_line_dedup


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_global_line_dedup_known_corpus():
    """First global occurrence of each line survives; later copies are
    stripped; fully-stripped docs drop out."""
    ds = _docs([
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),         # beta is doc 1's -> removed
        (3, "alpha\nbeta\ngamma"),  # fully duplicate -> dropped
        (4, "epsilon"),
    ]).repartition(3)
    out = (
        global_line_dedup(ds, sep="\n")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["text"].tolist() == ["alpha\nbeta\ngamma", "delta", "epsilon"]
    assert out["n_removed"].tolist() == [0, 1, 0]


def test_global_line_dedup_winner_is_min_id_then_pos():
    """Ties break by (id, pos): the line in the SMALLEST doc id wins, and
    within a doc its first position wins."""
    ds = _docs([
        (7, "x\ny"),
        (2, "y\nx\nx"),   # doc 2 wins both lines; its second x removed
    ])
    out = (
        global_line_dedup(ds, sep="\n")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [2]
    assert out["text"].tolist() == ["y\nx"]
    assert out["n_removed"].tolist() == [1]


def test_global_line_dedup_keep_empty_and_nulls():
    """drop_empty=False keeps stripped docs with empty text; null text is
    treated as '' (one empty line, globally deduped)."""
    ds = _docs([(1, "a"), (2, "a"), (3, None), (4, "")])
    out = (
        global_line_dedup(ds, sep="\n", drop_empty=False)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    assert out["text"].tolist() == ["a", "", "", ""]
    # doc 3 (null -> "") wins the empty line; doc 4's copy is removed
    assert out["n_removed"].tolist() == [0, 1, 0, 1]


def _random_word_corpus(n=300, vocab=24, seed=5):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 14)))
        for _ in range(n)
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_global_line_dedup_matches_duckdb_window_oracle():
    """Word-granularity dedup equals the SQL row_number()=1 formulation."""
    t = _random_word_corpus()
    got = (
        global_line_dedup(rd.from_arrow(t).repartition(5), sep=" ")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute("""
        WITH exploded AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS w,
                 unnest(range(len(string_split(coalesce(text, ''), ' ')))) AS pos
          FROM documents
        ), ranked AS (
          SELECT doc_id, pos, w,
                 row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
          FROM exploded
        )
        SELECT doc_id,
               string_agg(w, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS text,
               CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed
        FROM ranked GROUP BY doc_id
        HAVING count(*) FILTER (WHERE rn = 1) > 0
        ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got, want)


def test_global_line_dedup_partitioned_equals_broadcast():
    """broadcast_limit=0 forces the co-partitioned removal plan; results
    must be identical to the broadcast plan, at any parallelism."""
    t = _random_word_corpus(n=200, vocab=18, seed=9)
    base = (
        global_line_dedup(rd.from_arrow(t), sep=" ")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for parts in (1, 7):
        forced = (
            global_line_dedup(
                rd.from_arrow(t).repartition(parts), sep=" ",
                broadcast_limit=0, coarse=13,
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(forced, base)


def test_global_line_dedup_no_duplicates_is_identity():
    ds = _docs([(1, "a\nb"), (2, "c\nd")])
    out = (
        global_line_dedup(ds, sep="\n")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["text"].tolist() == ["a\nb", "c\nd"]
    assert out["n_removed"].tolist() == [0, 0]


def test_global_line_dedup_string_ids():
    """Non-integer ids order lexicographically for winner election."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["b", "a"], pa.string()),
        "text": pa.array(["dup\nx", "dup\ny"], pa.string()),
    }))
    out = (
        global_line_dedup(ds, sep="\n")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == ["a", "b"]
    assert out["text"].tolist() == ["dup\ny", "x"]


def test_dedup_lines_within_keeps_first_per_doc():
    from log_formatter_ray.ops.linededup import dedup_lines_within

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a\nb\na\nb\nc", "x\nx\nx", "u\nv"], pa.string()),
    })
    out = dedup_lines_within(t)
    assert out["text"].to_pylist() == ["a\nb\nc", "x", "u\nv"]
    assert out["n_removed"].to_pylist() == [2, 2, 0]
    # sliced batch behaves identically
    part = dedup_lines_within(t.slice(1, 2))
    assert part["text"].to_pylist() == ["x", "u\nv"]


def test_dedup_lines_within_matches_duckdb():
    import duckdb

    from log_formatter_ray.ops.linededup import dedup_lines_within

    t = _random_word_corpus(n=250, vocab=12, seed=21)
    got = dedup_lines_within(t, sep=" ").to_pandas()
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute("""
        WITH exploded AS (
          SELECT doc_id,
                 unnest(string_split(coalesce(text, ''), ' ')) AS w,
                 unnest(range(len(string_split(coalesce(text, ''), ' ')))) AS pos
          FROM documents
        ), ranked AS (
          SELECT doc_id, pos, w,
                 row_number() OVER (PARTITION BY doc_id, w
                                    ORDER BY pos) AS rn
          FROM exploded
        )
        SELECT doc_id,
               string_agg(w, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS text,
               CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed
        FROM ranked GROUP BY doc_id ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want
    )
