"""Driver-gate registry invariants: the correctness gate exercises only
the FIRST 50 ``QUERIES`` entries, so every one of those slots must carry
an oracle-backed query (VERDICT r3's headline finding — 14 oracle passes
were invisible beyond the cutoff)."""

from log_formatter_ray.pipelines.queries import QUERIES, oracle_sql_for


def test_first_fifty_queries_all_oracle_backed():
    names = list(QUERIES)
    oracle = set(oracle_sql_for("/root/testdata/sf0.001"))
    missing = [n for n in names[:50] if n not in oracle]
    assert not missing, (
        f"gate slots 1-50 must be oracle-backed; rows-only found: {missing}"
    )


def test_registry_names_unique_and_callable():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert all(callable(fn) for fn in QUERIES.values())


def test_every_oracle_name_has_a_query():
    oracle = oracle_sql_for("/root/testdata/sf0.001")
    missing = [n for n in oracle if n not in QUERIES]
    assert not missing, f"oracle SQL without a query: {missing}"


# Unique-SQL oracle queries the 50-slot gate window cannot hold (more
# distinct SQLs exist than slots).  Each is justified in its query
# docstring (sort_limit: semantics covered by the gate's top-k entries;
# dup_line: added after the window filled) and still verified by
# tools/check_oracle.py.  Growing this set requires the same
# justification.
GATE_INVISIBLE_UNIQUE_SQL = {
    "sort_limit_documents",
    "dup_line_documents",
    "gopher_filter_documents",
    "incdedup_documents",
    "dedup_lines_within_documents",
    "dup_overlap_documents",
    "line_dedup_documents",
    "stratified_sample_documents",
    "decontaminate_sequences",
    "remap_tokens_sequences",
    "token_budget_sample_sequences",
    "bpe_pair_counts_sequences",
    "exact_substr_sequences",
    "token_repetition_sequences",
    "chunk_overlap_sequences",
    "contamination_score_sequences",
    "corpus_report_sequences",
    "length_buckets_sequences",
    "top_dup_grams_sequences",
}


def test_oracle_queries_outside_gate_share_sql_verbatim_or_allowlisted():
    """ADVICE r4: an oracle query past slot 50 whose SQL no gate entry
    duplicates is silently never exercised by the driver gate.  Every
    such query must either share its SQL VERBATIM with a gate entry or
    sit in the explicit allowlist above."""
    oracle = oracle_sql_for("/root/testdata/sf0.001")
    names = list(QUERIES)
    gate_sqls = {" ".join(oracle[n].split()) for n in names[:50] if n in oracle}
    offenders = [
        n for n in names[50:]
        if n in oracle
        and " ".join(oracle[n].split()) not in gate_sqls
        and n not in GATE_INVISIBLE_UNIQUE_SQL
    ]
    assert not offenders, (
        f"unique-SQL oracle queries hidden past the gate window: {offenders}"
    )
    # and the allowlist must not rot: its members stay oracle-backed,
    # registered, and actually outside the window
    for n in GATE_INVISIBLE_UNIQUE_SQL:
        assert n in oracle and n in names[50:]
