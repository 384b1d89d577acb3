"""grouped_count (partial-agg + small groupby) vs a DuckDB oracle."""

import duckdb
import ray.data as rd

from log_formatter_ray.stages.aggregate import grouped_count


def test_grouped_count_matches_duckdb(seq_batch):
    ds = rd.from_arrow(seq_batch).repartition(7)  # force multiple blocks
    got = (
        grouped_count(ds, ["source"], count_alias="n", sum_cols={"n_tok": "sum_n_tok"})
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            "SELECT source, COUNT(*) AS n, SUM(n_tok) AS sum_n_tok "
            "FROM seq_batch GROUP BY source ORDER BY source"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n"].tolist() == exp["n"].astype(int).tolist()
    assert got["sum_n_tok"].tolist() == exp["sum_n_tok"].astype(int).tolist()


def test_grouped_count_multi_key(seq_batch):
    ds = rd.from_arrow(seq_batch)
    got = grouped_count(ds, ["source", "n_tok"], count_alias="c").to_pandas()
    assert got["c"].sum() == len(seq_batch)
