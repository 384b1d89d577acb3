"""Flagship end-to-end vs a single-process pure-pyarrow/re oracle
(FIXTURES.md §6 invariants)."""

import collections
import glob
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from log_formatter_ray.fixtures import make_source_lookup
from log_formatter_ray.pipelines.flagship import DOC_ID_PATTERN, run_flagship


def _read_corpus(corpus_dir: str) -> pa.Table:
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _oracle_sinks(table: pa.Table) -> list[str]:
    """Doc-at-a-time oracle: python re + dict lookup + rule cascade."""
    rx = re.compile(DOC_ID_PATTERN)
    lk = make_source_lookup()
    tier_of = dict(zip(lk["source"].to_pylist(), lk["tier"].to_pylist()))
    sinks = []
    for doc_id, n_tok, source in zip(
        table["doc_id"].to_pylist(),
        table["n_tok"].to_pylist(),
        table["source"].to_pylist(),
    ):
        if not rx.match(doc_id):
            sinks.append("sink_quarantine")
        elif tier_of.get(source) == "premium":
            sinks.append("sink_premium")
        elif n_tok >= 1024:
            sinks.append("sink_long")
        else:
            sinks.append("sink_standard")
    return sinks


@pytest.fixture(scope="module")
def flagship_run(corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship_out"))
    res = run_flagship(corpus_dir, out)
    return corpus_dir, out, res


def test_cardinality_conservation(flagship_run):
    # the reference's own e2e check (check-same-line.sh): out rows == in rows
    corpus_dir, out, res = flagship_run
    assert res.rows_in == 5000
    assert res.rows_routed == res.rows_in  # tolerant mode drops nothing
    assert sum(m.rows_dropped for m in res.manifests.values()) == 0


def test_counts_match_oracle(flagship_run):
    corpus_dir, out, res = flagship_run
    inp = _read_corpus(corpus_dir)
    expected = collections.Counter(
        zip(_oracle_sinks(inp), inp["source"].to_pylist())
    )
    got = {
        (s, src): n
        for s, src, n in zip(
            res.counts["sink"].to_pylist(),
            res.counts["source"].to_pylist(),
            res.counts["n"].to_pylist(),
        )
    }
    assert got == dict(expected)


def test_routed_row_sets_and_token_byte_equality(flagship_run):
    corpus_dir, out, res = flagship_run
    inp = _read_corpus(corpus_dir)
    oracle_sink = dict(zip(inp["doc_id"].to_pylist(), _oracle_sinks(inp)))

    written = pq.read_table(f"{out}/data")
    assert len(written) == len(inp)

    # routed-row SET equality per sink (order-insensitive)
    got_sink = dict(
        zip(written["doc_id"].to_pylist(), written["sink"].to_pylist())
    )
    assert got_sink == oracle_sink

    # byte-exact token-array equality per row (zero-copy invariant)
    w = written.select(["doc_id", "tokens", "n_tok"]).sort_by("doc_id")
    i = inp.select(["doc_id", "tokens", "n_tok"]).sort_by("doc_id")
    assert w["doc_id"].equals(i["doc_id"]) or w["doc_id"].to_pylist() == i["doc_id"].to_pylist()
    assert w["tokens"].combine_chunks().equals(i["tokens"].combine_chunks())
    # n_tok == len(tokens) preserved through every stage
    lens = pa.compute.list_value_length(w["tokens"]).cast(pa.int32())
    assert pa.compute.all(pa.compute.equal(lens, w["n_tok"])).as_py()


def test_quarantine_counts_malformed(flagship_run):
    corpus_dir, out, res = flagship_run
    by_sink = collections.Counter()
    for m in res.manifests.values():
        for s, n in m.sink_counts.items():
            by_sink[s] += n
    assert by_sink["sink_quarantine"] == 100  # 2% of 5000


def test_manifest_lineage(flagship_run):
    corpus_dir, out, res = flagship_run
    assert len(res.manifests) == 4  # one per input shard
    for m in res.manifests.values():
        assert m.rows_in == m.rows_routed == sum(m.sink_counts.values())
        assert m.token_bytes == 4 * m.token_sum
        assert len(m.input_files) == 1


def test_strict_mode_drops_malformed(corpus_dir, tmp_path):
    out = str(tmp_path / "strict_out")
    res = run_flagship(corpus_dir, out, error_tolerant=False)
    assert res.rows_in == 5000
    assert res.rows_in - res.rows_routed == 100  # reference drop semantics
    assert sum(m.rows_dropped for m in res.manifests.values()) == 100
    sinks = set()
    for m in res.manifests.values():
        sinks.update(m.sink_counts)
    assert "sink_quarantine" not in sinks


def test_flagship_actor_pool_enrich_matches_tasks(corpus_dir, tmp_path):
    """enrich_mode='actors' (actor-pool LookupEnricher) must produce the
    same counts as the default elastic-task mode."""
    from log_formatter_ray.pipelines.flagship import run_flagship

    a = run_flagship(corpus_dir, str(tmp_path / "t"), enrich_mode="tasks")
    b = run_flagship(
        corpus_dir, str(tmp_path / "a"), enrich_mode="actors",
        enrich_concurrency=(1, 2),
    )
    assert a.counts.equals(b.counts)


def test_flagship_extreme_source_skew(tmp_path):
    """All rows share ONE source (the worst hot key): partial aggregation
    must keep the run healthy and the counts exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from log_formatter_ray.fixtures import make_sequences_batch
    from log_formatter_ray.pipelines.flagship import run_flagship

    src = tmp_path / "skew"
    src.mkdir()
    total = 0
    for i in range(4):
        t = make_sequences_batch(2000, start_row=i * 2000)
        n = len(t)
        t = t.set_column(
            t.column_names.index("source"), "source",
            pa.array(["web"] * n, pa.string()),
        )
        total += n
        pq2.write_table(t, str(src / f"part-{i:05d}.parquet"))
    res = run_flagship(str(src), str(tmp_path / "out"))
    assert res.rows_in == res.rows_routed == total
    df = res.counts.to_pandas()
    assert set(df["source"]) == {"web"}
    assert df["n"].sum() == total
