"""Aggregate stage — partial (combiner) aggregation before the shuffle.

The reference's only aggregation is per-queue prometheus counters
(/root/reference/agent/connector/queue.go:24-59); the rebuild's contract is
grouped per-sink × source counts (BASELINE.json north_star).

Scale design: a bare ``groupby(keys).aggregate(...)`` shuffles EVERY row —
at 10^12 sequences with Zipf-skewed ``source`` that is both an all-to-all
exchange of the full corpus and a hot-key problem.  Instead each batch is
collapsed to at most |distinct keys in batch| partial rows with Arrow's
hash aggregation (``Table.group_by``), and only those partials — a few
hundred rows per block regardless of block size — go through the final
``groupby``.  Pre-aggregation also *defuses key skew*: the final shuffle
sees one row per (block × key), uniform by construction, so no salting is
needed on top; salting would only matter if partials themselves were huge
(keys ≫ rows/block), which counts-by-source is not.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Sum


def _partial_agg_fn(keys: list[str], count_alias: str, sum_cols: dict[str, str]):
    aggs = [([], "count_all")] + [(c, "sum") for c in sum_cols]
    renames = {"count_all": count_alias}
    renames.update({f"{c}_sum": alias for c, alias in sum_cols.items()})

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(keys).aggregate(aggs)
        return t.rename_columns([renames.get(c, c) for c in t.column_names])

    return partial


def grouped_count(
    ds,
    keys: list[str],
    count_alias: str = "n",
    sum_cols: dict[str, str] | None = None,
):
    """``SELECT keys, COUNT(*) AS count_alias[, SUM(c) AS alias ...] GROUP BY keys``
    with per-block partial aggregation; returns a (small) Dataset.

    ``sum_cols`` maps source column → output alias.
    """
    sum_cols = sum_cols or {}
    partials = ds.map_batches(
        _partial_agg_fn(list(keys), count_alias, sum_cols),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    aggs = [Sum(count_alias, alias_name=count_alias)]
    aggs += [Sum(alias, alias_name=alias) for alias in sum_cols.values()]
    return partials.groupby(list(keys)).aggregate(*aggs)
