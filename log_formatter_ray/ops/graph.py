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
  groupbys over COARSE partitions of the node space (``hash(node) %
  coarse``) — (1) labels union the static edge-incidence rows, and a
  vectorized pandas merge inside each partition SPREADS every node's label
  to its neighbors; (2) the messages group by receiving node's partition
  and a vectorized groupby-min takes the minimum over {self} ∪ neighbors —
  stopping when no label changed.  Group functions run once per coarse
  partition, never once per node.  Converges in O(component diameter)
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

import numpy as np
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
    coarse: int = 256,
    strict: bool = True,
):
    """Connected components of the undirected graph given by ``edges``
    (duplicate edges are fine) → Dataset ``(id, rep)`` where ``rep`` is the
    minimum node id of the component.  Only nodes that appear in at least
    one edge are labeled.

    ``strict`` (default): RAISE if label propagation has not converged
    after ``max_iters`` rounds (graph diameter > max_iters, e.g. a long
    chain of overlapping LSH cliques).  The consumer deletes documents
    under these representatives, so returning partially-propagated labels
    would be silent data loss; pass ``strict=False`` to get the
    best-effort labels with a warning instead.
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

    # --- iterative min-label propagation (join-free, coarse-partitioned) --
    #
    # All per-round state is keyed by a COARSE hash partition of the node
    # space (node_hash % coarse), and every group function is vectorized
    # pandas over its whole partition (merge / groupby-min) — never one
    # Python call per node, which at the >local_edge_limit scale this mode
    # exists for would dwarf the real work.
    schema = edges.schema()
    node_t = dict(zip(schema.names, schema.types))[a_col]
    union_schema = pa.schema(
        [("part", pa.int32()), ("node", node_t), ("label", node_t),
         ("other", node_t), ("is_inc", pa.int8())]
    )
    lab_schema = pa.schema(
        [("part", pa.int32()), ("node", node_t), ("label", node_t)]
    )

    is_int_node = pa.types.is_integer(node_t)

    def _dummy(n: int) -> pa.Array:
        # Row-kind is carried by the EXPLICIT is_inc flag, never by nulls:
        # a null in an int64 column would make pandas upcast the whole
        # column to float64 inside the group functions, silently corrupting
        # node ids >= 2^53.  Integer columns get a 0 dummy; other types
        # keep nulls (object transport is lossless).
        if is_int_node:
            return pa.array(np.zeros(n, dtype=np.int64)).cast(node_t)
        return pa.nulls(n, node_t)

    def _part_np(values: np.ndarray) -> np.ndarray:
        arr = np.asarray(values)
        # canonicalize before hashing: pandas rounds upcast int nodes to
        # float64 (null padding), and hash_array(float) != hash_array(int)
        # — a drifted dtype would scatter a node's rows across partitions
        if is_int_node:
            arr = arr.astype(np.int64)
        elif arr.dtype != object:
            arr = arr.astype(object)
        h = pd.util.hash_array(arr, categorize=False)
        return (h % np.uint64(coarse)).astype(np.int32)

    def _part_arrow(arr: pa.Array) -> pa.Array:
        return pa.array(_part_np(arr.to_numpy(zero_copy_only=False)))

    def make_incidence(b: pa.Table) -> pa.Table:
        a = b[a_col].combine_chunks().cast(node_t)
        bb = b[b_col].combine_chunks().cast(node_t)
        n = len(b)
        node = pa.concat_arrays([a, bb])
        return pa.table(
            {
                "part": _part_arrow(node),
                "node": node,
                "label": _dummy(2 * n),
                "other": pa.concat_arrays([bb, a]),
                "is_inc": pa.array(np.ones(2 * n, np.int8)),
            }
        ).cast(union_schema)

    incidence = edges.map_batches(
        make_incidence, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).materialize()

    def init_pairs(b: pa.Table) -> pa.Table:
        a = b[a_col].combine_chunks().cast(node_t)
        bb = b[b_col].combine_chunks().cast(node_t)
        m = pc.min_element_wise(a, bb)
        node = pa.concat_arrays([a, bb])
        return pa.table(
            {
                "part": _part_arrow(node),
                "node": node,
                "label": pa.concat_arrays([m, m]),
            }
        ).cast(lab_schema)

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["node", "label"]).drop_duplicates("node")
        return out[["part", "node", "label"]]

    def norm_labels(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or len(b) == 0:
            return lab_schema.empty_table()
        return b.select(["part", "node", "label"]).cast(lab_schema)

    labels = (
        edges.map_batches(
            init_pairs, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
        .groupby("part")
        .map_groups(min_per_node, batch_format="pandas")
        .map_batches(norm_labels, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .materialize()
    )

    def widen_labels(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or len(b) == 0:
            return union_schema.empty_table()
        return pa.table(
            {
                "part": b["part"].combine_chunks(),
                "node": b["node"].combine_chunks(),
                "label": b["label"].combine_chunks(),
                "other": _dummy(len(b)),
                "is_inc": pa.array(np.zeros(len(b), np.int8)),
            }
        ).cast(union_schema)

    def spread(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse partition: label rows + incidence rows for its nodes.
        Vectorized: attach each sender's label via a pandas merge, emit one
        message per edge direction plus the tagged self rows."""
        is_lab = g["is_inc"] == 0
        lab = g.loc[is_lab, ["node", "label"]].drop_duplicates("node")
        inc = g.loc[~is_lab, ["node", "other"]]
        m = inc.merge(lab, on="node", how="inner")
        msgs = pd.DataFrame(
            {"node": m["other"], "label": m["label"], "is_old": np.int8(0)}
        )
        olds = pd.DataFrame(
            {"node": lab["node"], "label": lab["label"], "is_old": np.int8(1)}
        )
        out = pd.concat([msgs, olds], ignore_index=True)
        out["part"] = _part_np(out["node"].to_numpy())
        return out

    def reduce_round(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse partition of messages → per-node min + changed flag,
        all vectorized (groupby-min + aligned compare)."""
        olds = (
            g.loc[g["is_old"] == 1, ["node", "label"]]
            .drop_duplicates("node")
            .set_index("node")["label"]
        )
        mins = g.groupby("node", sort=False)["label"].min()
        changed = (mins < olds.reindex(mins.index)).fillna(False)
        return pd.DataFrame(
            {
                "part": g["part"].iloc[0],
                "node": mins.index,
                "label": mins.values,
                "changed": changed.to_numpy().astype(np.int64),
            }
        )

    for _ in range(max_iters):
        merged = labels.map_batches(
            widen_labels, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ).union(incidence)
        msgs = merged.groupby("part").map_groups(spread, batch_format="pandas")
        new_labels = msgs.groupby("part").map_groups(
            reduce_round, batch_format="pandas"
        ).materialize()
        changed = new_labels.sum("changed")
        labels = (
            new_labels.drop_columns(["changed"])
            .map_batches(norm_labels, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
            .materialize()
        )
        if not changed:
            break
    else:
        if strict:
            raise RuntimeError(
                f"connected_components: not converged after {max_iters} "
                f"rounds (graph diameter exceeds max_iters; labels would "
                f"be wrong and downstream dedup would drop documents under "
                f"incorrect representatives) — raise max_iters, or pass "
                f"strict=False for best-effort labels"
            )
        logger.warning(
            "connected_components: not converged after %d rounds", max_iters
        )

    def rename(b: pa.Table) -> pa.Table:
        return b.select(["node", "label"]).rename_columns(["id", "rep"])

    return labels.map_batches(
        rename, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
