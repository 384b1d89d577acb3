"""Lookup-enrich stage — broadcast dictionary join, no shuffle.

The reference's static-label merge (/root/reference/agent/pipeline/
pipeline.go:20-22,169-171 — "TODO: move labelling to proper component")
generalized to a translate-style enrich: a small ``source → attributes``
table is broadcast once via ``ray.put`` and every actor resolves it ONCE in
``__init__``; per batch the join is a vectorized ``pc.index_in`` +
``pc.take`` (dictionary lookup), never a distributed shuffle.

At 100 TB scale this is the broadcast-join side of the design: the lookup
lives once per node in the object store (zero-copy reads from shared
memory), not once per task and never re-shipped per batch.

Use as::

    ref = ray.put(lookup_table)          # driver, once
    ds.map_batches(LookupEnricher(ref, key="source"),
                   batch_format="pyarrow", concurrency=8)

``LookupEnricher`` is a callable *class* instance; Ray Data treats the
fn-constructor form (``map_batches(LookupEnricher, fn_constructor_args=...)``)
as an actor pool.  Passing a constructed instance also works for stateless
tasks; the expensive part (``ray.get``) is lazy and cached per process.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class LookupEnricher:
    """Append ``value_cols`` of ``lookup`` to each batch by equi-key lookup.

    Missing keys yield nulls (FIXTURES.md §2: "misc" has no lookup row).
    """

    def __init__(self, lookup, key: str, value_cols: list[str] | None = None):
        self._lookup_src = lookup  # ObjectRef | pa.Table | dict[str, dict]
        self.key = key
        self.value_cols = value_cols
        self._keys = None
        self._values = None

    # -- one-time setup (per actor / per worker process) -------------------
    def _ensure_loaded(self):
        if self._keys is not None:
            return
        import ray

        table = self._lookup_src
        if isinstance(table, ray.ObjectRef):
            table = ray.get(table)
        if isinstance(table, dict):  # {key: {col: val}} convenience form
            cols: dict[str, list] = {self.key: list(table.keys())}
            first = next(iter(table.values()))
            for c in first:
                cols[c] = [v[c] for v in table.values()]
            table = pa.table(cols)
        if self.value_cols is None:
            self.value_cols = [c for c in table.column_names if c != self.key]
        self._keys = table[self.key].combine_chunks()
        self._values = {c: table[c].combine_chunks() for c in self.value_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure_loaded()
        idx = pc.index_in(batch[self.key], value_set=self._keys)
        for name, values in self._values.items():
            col = pc.take(values, idx)  # null idx → null value (miss → null)
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, col)
            else:
                batch = batch.append_column(name, col)
        return batch


class StaticLabels:
    """The reference's literal behavior: merge constant key→value labels into
    every surviving doc (pipeline.go:169-171) — constant columns per batch."""

    def __init__(self, labels: dict[str, str]):
        self.labels = dict(labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        for name, val in self.labels.items():
            col = pa.nulls(n, pa.string()) if val is None else pa.array([val] * n, pa.string())
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, col)
            else:
                batch = batch.append_column(name, col)
        return batch
