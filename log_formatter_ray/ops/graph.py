"""Distributed connected components over a candidate-edge Dataset.

The consumer is near-duplicate clustering (``ops/dedup.py``): LSH emits a
sparse edge list (a, b) and every document in a component must map to the
component's minimum id (its representative).

Two execution plans, chosen like a query optimizer would:

* **single-worker contraction** (``mode="local"``): all edges are merged
  into one block and a union-find runs inside ONE Ray task (not the
  driver).  Edges ≪ corpus by the LSH-sparsity assumption, so this is the
  right plan up to ~10^8 edges (a few GB in one worker); the driver never
  holds per-document or per-edge data.
* **iterative min-label propagation** (``mode="distributed"``): the
  textbook bulk-synchronous CC.  Each round is two hash-partitioned
  groupbys — (1) group current labels with the static edge-incidence rows
  by node and SPREAD each node's label to its neighbors, (2) group the
  messages by receiving node and take the minimum over {self} ∪ neighbors
  — stopping when no label changed.  Converges in O(component diameter)
  rounds (near-dup graphs are unions of bucket cliques: diameter is
  small).  No ``Dataset.join`` is used: Ray 2.49's hash-join builds
  schema-less empty tables for empty partitions, which poisons pyarrow's
  join — groupby has no such edge case.  The driver sees only the
  per-round changed-counter.

``mode="auto"`` picks local below ``local_edge_limit`` edges, else
distributed.
"""

from __future__ import annotations

import logging

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

logger = logging.getLogger("log_formatter_ray")


def _local_cc(a_col: str, b_col: str):
    """Union-find over one merged edge block → (id, rep) rows."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            p = parent.setdefault(x, x)
            while p != x:
                parent[x] = p = parent.setdefault(p, p)
                x = p
                p = parent[x]
            return x

        for a, b in zip(batch[a_col], batch[b_col]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = list(parent)
        return pd.DataFrame({"id": nodes, "rep": [find(x) for x in nodes]})

    return fn


def connected_components(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    mode: str = "auto",
    local_edge_limit: int = 5_000_000,
    max_iters: int = 50,
):
    """Connected components of the undirected graph given by ``edges``
    (duplicate edges are fine) → Dataset ``(id, rep)`` where ``rep`` is the
    minimum node id of the component.  Only nodes that appear in at least
    one edge are labeled.
    """
    edges = edges.select_columns([a_col, b_col]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame({"id": [], "rep": []}))
    if mode == "auto":
        mode = "local" if n_edges <= local_edge_limit else "distributed"
    if mode == "local":
        return edges.repartition(1).map_batches(
            _local_cc(a_col, b_col), batch_format="pandas", batch_size=None
        )

    # --- iterative min-label propagation (join-free BSP) ----------------
    schema = edges.schema()
    node_t = dict(zip(schema.names, schema.types))[a_col]
    lab_schema = pa.schema([("node", node_t), ("label", node_t)])
    union_schema = pa.schema(
        [("node", node_t), ("label", node_t), ("other", node_t)]
    )
    msg_schema = pa.schema(
        [("node", node_t), ("label", node_t), ("is_old", pa.int8())]
    )

    def make_incidence(b: pa.Table) -> pa.Table:
        a = b[a_col].combine_chunks()
        bb = b[b_col].combine_chunks()
        n = len(b)
        return pa.table(
            {
                "node": pa.concat_arrays([a.cast(node_t), bb.cast(node_t)]),
                "label": pa.nulls(2 * n, node_t),
                "other": pa.concat_arrays([bb.cast(node_t), a.cast(node_t)]),
            }
        ).cast(union_schema)

    incidence = edges.map_batches(
        make_incidence, batch_format="pyarrow", batch_size=None
    ).materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        a = b[a_col].combine_chunks().cast(node_t)
        bb = b[b_col].combine_chunks().cast(node_t)
        m = pc.min_element_wise(a, bb)
        return pa.table(
            {
                "node": pa.concat_arrays([a, bb]),
                "label": pa.concat_arrays([m, m]),
            }
        ).cast(lab_schema)

    def min_label(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array([t["node"][0].as_py()], node_t),
                "label": pa.array([pc.min(t["label"]).as_py()], node_t),
            }
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .map_groups(min_label, batch_format="pyarrow")
        .materialize()
    )

    def widen_labels(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or len(b) == 0:
            return union_schema.empty_table()
        return pa.table(
            {
                "node": b["node"].combine_chunks(),
                "label": b["label"].combine_chunks(),
                "other": pa.nulls(len(b), node_t),
            }
        ).cast(union_schema)

    def spread(t: pa.Table) -> pa.Table:
        """One node's group: its current label row(s) + its incidence rows.
        Sends the label to every neighbor, plus the tagged self row."""
        is_inc = pc.is_valid(t["other"])
        inc_other = t.filter(is_inc)["other"].combine_chunks()
        lbl = pc.min(t.filter(pc.invert(is_inc))["label"]).as_py()
        x = t["node"][0].as_py()
        n_inc = len(inc_other)
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [inc_other.cast(node_t), pa.array([x], node_t)]
                ),
                "label": pa.array([lbl] * (n_inc + 1), node_t),
                "is_old": pa.array([0] * n_inc + [1], pa.int8()),
            }
        ).cast(msg_schema)

    def reduce_round(t: pa.Table) -> pa.Table:
        old = pc.min(t.filter(pc.equal(t["is_old"], 1))["label"]).as_py()
        new = pc.min(t["label"]).as_py()
        return pa.table(
            {
                "node": pa.array([t["node"][0].as_py()], node_t),
                "label": pa.array([new], node_t),
                "changed": pa.array([int(new < old)], pa.int64()),
            }
        )

    for _ in range(max_iters):
        merged = labels.map_batches(
            widen_labels, batch_format="pyarrow", batch_size=None
        ).union(incidence)
        msgs = merged.groupby("node").map_groups(spread, batch_format="pyarrow")
        new_labels = msgs.groupby("node").map_groups(
            reduce_round, batch_format="pyarrow"
        ).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break
    else:
        logger.warning(
            "connected_components: not converged after %d rounds", max_iters
        )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["id", "rep"])

    return labels.map_batches(rename, batch_format="pyarrow", batch_size=None)
