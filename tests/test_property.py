"""Property-based tests (hypothesis): vectorized stages ≡ doc-at-a-time
reference semantics on arbitrary inputs."""

import re

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import given, settings

# derandomize: the driver's pytest gate must never fail on a fresh random example
settings.register_profile("det", derandomize=True, deadline=None)
settings.load_profile("det")

from log_formatter_ray.ops.tokens import chunk_sequences
from log_formatter_ray.stages.parse import GrokParser
from log_formatter_ray.stages.route import Condition, Router, RouteRule, render_template

LINES = st.lists(
    st.text(alphabet="abc123-/ ", min_size=0, max_size=30), min_size=1, max_size=50
)

PATTERN = r"^(?P<head>[a-c]+)-(?P<num>\d+)$"
_RX = re.compile(PATTERN)


@given(LINES)
@settings(max_examples=40, deadline=None)
def test_parser_equals_python_re(lines):
    t = pa.table({"message": pa.array(lines, pa.string())})

    # drop mode ≡ filtering by rx.match
    p = GrokParser(components_regex=PATTERN, target_field="message")
    out = p(t)
    expected = [m for m in map(_RX.match, lines) if m]
    assert len(out) == len(expected)
    assert out["head"].to_pylist() == [m.group("head") for m in expected]
    assert out["num"].to_pylist() == [m.group("num") for m in expected]

    # tolerant mode preserves cardinality and nulls exactly the non-matches
    pt = GrokParser(
        components_regex=PATTERN, target_field="message",
        error_tolerant=True, ok_field="_ok",
    )
    out2 = pt(t)
    assert len(out2) == len(lines)
    assert out2["_ok"].to_pylist() == [bool(_RX.match(x)) for x in lines]


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 100)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=40, deadline=None)
def test_router_first_match_wins_vs_row_oracle(rows):
    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows]),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    rules = (
        RouteRule(sink="s_a", when=(Condition("k", "==", "a"),)),
        RouteRule(sink="s_big", when=(Condition("v", ">=", 50),)),
        RouteRule(sink="s_bc", when=(Condition("k", "in", ["b", "c"]), Condition("v", "<", 10))),
    )
    got = Router(rules=rules, default_sink="s_def")(t)["sink"].to_pylist()

    def oracle(k, v):  # doc-at-a-time first-match-wins
        if k == "a":
            return "s_a"
        if v >= 50:
            return "s_big"
        if k in ("b", "c") and v < 10:
            return "s_bc"
        return "s_def"

    assert got == [oracle(k, v) for k, v in rows]


@given(st.lists(st.sampled_from(["x", "y", None]), min_size=1, max_size=30))
@settings(max_examples=30, deadline=None)
def test_template_render_vs_python(vals):
    t = pa.table({"f": pa.array(vals, pa.string())})
    got = render_template(t, "pre-{{f}}-post").to_pylist()
    assert got == [f"pre-{v if v is not None else 'null'}-post" for v in vals]


@given(
    st.lists(st.integers(0, 2000), min_size=1, max_size=40),
    st.integers(1, 300),
)
@settings(max_examples=40, deadline=None)
def test_chunk_reassembly_property(lens, max_len):
    rng = np.random.default_rng(0)
    toks = [rng.integers(0, 1000, size=n, dtype=np.int32) for n in lens]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(len(lens))]),
            "tokens": pa.array([x.tolist() for x in toks], pa.list_(pa.int32())),
        }
    )
    out = chunk_sequences(t, max_len=max_len)
    assert max(out["n_tok"].to_pylist()) <= max_len
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"])
    for i, orig in enumerate(toks):
        parts = df[df["doc_id"] == f"d{i:04d}"]["tokens"]
        rebuilt = np.concatenate([np.asarray(p) for p in parts]) if len(parts) else np.array([])
        assert np.array_equal(rebuilt, orig)


@given(
    st.lists(st.integers(0, 2500), min_size=1, max_size=50),
    st.integers(64, 2048),
)
@settings(max_examples=40, deadline=None)
def test_pack_unpack_roundtrip_property(lens, ctx):
    """pack → unpack preserves every sequence (truncated at ctx), including
    empty token lists and rows longer than the context."""
    from log_formatter_ray.ops.tokens import pack_sequences, unpack_sequences

    rng = np.random.default_rng(1)
    toks = [rng.integers(0, 1000, size=n, dtype=np.int32) for n in lens]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(len(lens))]),
            "tokens": pa.array([x.tolist() for x in toks], pa.list_(pa.int32())),
        }
    )
    packs = pack_sequences(t, context_len=ctx)
    assert max(packs["n_tok"].to_pylist(), default=0) <= ctx
    back = unpack_sequences(packs).to_pandas().set_index("doc_id")
    assert sorted(back.index) == sorted(f"d{i:04d}" for i in range(len(lens)))
    for i, orig in enumerate(toks):
        got = np.asarray(back.loc[f"d{i:04d}", "tokens"])
        assert np.array_equal(got, orig[:ctx])


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.one_of(st.none(), st.integers(-50, 50)),
        ),
        min_size=1,
        max_size=120,
    ),
    st.sampled_from([0.1, 0.5, 0.95]),
)
@settings(max_examples=25, deadline=None)
def test_grouped_quantile_disc_vs_duckdb_property(rows, q):
    """grouped_quantile_disc == DuckDB quantile_disc on random keyed data
    with nulls in both key and value (null keys form a group; null values
    ignored; all-null keys yield NaN)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    df = pd.DataFrame(rows, columns=["k", "v"]).astype({"v": "float64"})
    got = (
        grouped_quantile_disc(
            rd.from_pandas(df).repartition(3), ["k"], "v", q, out_col="p",
            coarse=8,
        )
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(f"SELECT k, quantile_disc(v, {q}) AS p FROM df GROUP BY k")
        .df()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    assert got["k"].fillna("~").tolist() == exp["k"].fillna("~").tolist()
    for g, x in zip(got["p"], exp["p"]):
        assert (pd.isna(g) and pd.isna(x)) or g == x


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("L", "N", "P", "Zs"),
                    whitelist_characters=" \t  ",
                ),
                max_size=60,
            ),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_hashed_shingles_equal_string_ngram_sets(texts, k):
    """The round-4 hashed-word rolling-fold shingles must agree with the
    string ngram_set oracle on SIZE per row and on pairwise Jaccard —
    including unicode whitespace (str.split semantics), nulls, and short
    rows (single whole-row shingle)."""
    import pyarrow as pa

    from log_formatter_ray.ops.dedup import (
        _jaccard_sorted,
        _ngram_hash_sets,
        jaccard,
        ngram_set,
    )

    sets = _ngram_hash_sets(
        list(range(len(texts))), pa.array(texts, pa.string()), k
    )
    refs = [ngram_set(t, k) for t in texts]
    for i, r in enumerate(refs):
        assert len(sets[i]) == len(r), (i, texts[i], k)
    for i in range(len(texts)):
        for j in range(i, len(texts)):
            assert abs(
                _jaccard_sorted(sets[i], sets[j]) - jaccard(refs[i], refs[j])
            ) < 1e-12, (texts[i], texts[j], k)


@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([0.1, 0.25, 0.5, 0.9, 0.95, 0.99]),
    st.sampled_from([16, 64, 256]),
)
@settings(max_examples=8, deadline=None)
def test_binned_quantile_equals_duckdb_property(seed, q, bins):
    """grouped_quantile_binned must return DuckDB's exact quantile_disc
    for arbitrary continuous data, q, and bin counts — including
    duplicates straddling bin boundaries and skewed key sizes."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from log_formatter_ray.stages.aggregate import grouped_quantile_binned

    rng = np.random.default_rng(seed)
    frames = []
    for k, n in [("big", 3000), ("small", 37), ("one", 1)]:
        v = rng.normal(0, 1, n)
        # inject duplicates and exact repeats
        if n > 10:
            v[: n // 4] = np.round(v[: n // 4], 1)
        frames.append(pd.DataFrame({"k": k, "v": v}))
    df = pd.concat(frames, ignore_index=True)
    got = (
        grouped_quantile_binned(
            rd.from_pandas(df).repartition(4), ["k"], "v", q, "out",
            bins=bins,
        )
        .to_pandas().set_index("k")["out"]
    )
    exp = duckdb.sql(
        f"SELECT k, quantile_disc(v, {q}) AS out FROM df GROUP BY k"
    ).df().set_index("k")["out"]
    for k in ("big", "small", "one"):
        assert got[k] == exp[k], (seed, q, bins, k, got[k], exp[k])


# --- round-5 text ops: DuckDB-parity under arbitrary text ---

TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet="ab# … é9", min_size=0, max_size=24),
    ),
    min_size=1,
    max_size=25,
)


@given(TEXTS)
@settings(max_examples=30, deadline=None)
def test_gopher_filter_equals_duckdb_on_arbitrary_text(texts):
    import duckdb
    import pandas as pd

    from log_formatter_ray.ops.textstats import gopher_quality_filter

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = (
        gopher_quality_filter(t, min_words=1, max_words=10,
                              mwl2_lo=0, mwl2_hi=100, min_stop=0)
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
        WHERE n_words BETWEEN 1 AND 10
          AND 0*n_words <= 2*content_chars AND 2*content_chars <= 100*n_words
          AND n_stop >= 0 AND 5*n_alpha >= 4*n_words AND 10*n_sym <= n_words
        ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


@given(st.lists(
    st.text(alphabet="ab é ", min_size=0, max_size=20),
    min_size=1, max_size=20,
))
@settings(max_examples=12, deadline=None)  # each example is a Ray run
def test_global_line_dedup_equals_duckdb_on_arbitrary_text(texts):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from log_formatter_ray.ops.linededup import global_line_dedup

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = (
        global_line_dedup(rd.from_arrow(t), sep=" ", coarse=7)
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
