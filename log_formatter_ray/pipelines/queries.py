"""Driver-contract queries: one entry per operator/pipeline (SURVEY.md §2),
each runnable over a testdata ``sf_dir`` and mirrored by ANSI SQL in
``ORACLE_SQL`` for the DuckDB side-by-side check.

Column names/types are deliberately matched between the Ray result and the
SQL (the driver hash-compares values under sorted column names); SUMs are
cast to BIGINT in SQL because DuckDB widens integer SUM to HUGEINT.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from log_formatter_ray.ops.ann import IVFIndex, brute_force_topk
from log_formatter_ray.ops.dedup import (
    add_simhash,
    exact_dedup,
    embedding_dup_pairs,
    minhash_lsh_clusters,
)
from log_formatter_ray.ops.multimodal import ImageDecoder, make_fake_media
from log_formatter_ray.ops.textstats import (
    LangIdScorer,
    add_bpe_ish_count,
    add_fingerprint_md5,
    add_quality_stats,
    add_rolling_fingerprint,
    add_token_count,
    BPE_ISH_PATTERN,
)
from log_formatter_ray.ops.window import session_windows, tumbling_window_count
from log_formatter_ray.stages.aggregate import grouped_count
from log_formatter_ray.stages.enrich import LookupEnricher
from log_formatter_ray.stages.filter import FieldFilter
from log_formatter_ray.stages.parse import GrokParser
from log_formatter_ray.stages.route import Condition, Router, RouteRule

_TIERS = ["premium", "standard", "raw"]


def _tbl(sf_dir: str, name: str, columns=None):
    from log_formatter_ray.sources import read_parquet_clean

    # the driver's parquet carries pandas schema metadata that makes
    # pa.Schema unhashable — stripped inside the read tasks so Ray's
    # schema dedup works and the per-task warning disappears
    return read_parquet_clean(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def _adaptive_coarse(sf_dir: str, name: str = "documents", per: int = 50,
                     lo: int = 16, hi: int = 1024) -> int:
    """Corpus-sized coarse-partition count for the keyed/LSH map_groups
    stages: each coarse partition costs a fixed ~1-5 ms of groupby
    machinery (TUNING.md), so a small corpus must not pay the
    at-scale partition count (measured: simhash candidates at 500 docs,
    coarse 1024 → 7.5 s vs coarse 16 → 1.9 s; the 200k-doc runs that
    tuned `hi`=1024 are unaffected).  Row count comes from parquet
    footer metadata — no data read, no Ray tasks."""
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(
        os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows
    return int(min(hi, max(lo, n // per)))


# ---------------------------------------------------------------------------
# Flagship over documents: parse → enrich → route → aggregate (oracle-checked)
# ---------------------------------------------------------------------------

def q_flagship_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    parser = GrokParser(
        components_regex=r"^src(?P<src_num>\d+)$",
        target_field="source",
        casts={"src_num": pa.int64()},
        error_tolerant=True,  # a regex miss nulls the field; SQL keeps the row
    )
    ds = ds.map_batches(parser, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # the broadcast lookup enumerates src0..src999 — the SQL encodes the
    # SAME bound so the contract is visible on both sides
    lookup = pa.table(
        {
            "source": pa.array([f"src{i}" for i in range(1000)]),
            "tier": pa.array([_TIERS[i % 3] for i in range(1000)]),
        }
    )
    ds = ds.map_batches(
        LookupEnricher(ray.put(lookup), key="source"), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True
    )
    router = Router(
        rules=(
            RouteRule(sink="sink_premium", when=(Condition("tier", "==", "premium"),)),
            RouteRule(sink="sink_long", when=(Condition("n_chars", ">=", 400),)),
        ),
        default_sink="sink_standard",
    )
    ds = ds.map_batches(router, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return grouped_count(ds, ["sink", "source"], count_alias="n")


_SQL_FLAGSHIP_DOCUMENTS = """
SELECT sink, source, COUNT(*) AS n FROM (
  SELECT source,
         CASE WHEN src_num % 3 = 0 AND src_num < 1000 THEN 'sink_premium'
              WHEN n_chars >= 400 THEN 'sink_long'
              ELSE 'sink_standard' END AS sink
  FROM (SELECT source, n_chars,
               CAST(NULLIF(regexp_extract(source, '^src(\\d+)$', 1), '') AS BIGINT)
                 AS src_num
        FROM documents))
GROUP BY sink, source
"""


# ---------------------------------------------------------------------------
# Parse (grok/regex) operators
# ---------------------------------------------------------------------------

def q_parse_events_props(sf_dir: str):
    ds = _tbl(sf_dir, "events", columns=["event_type", "props"])
    parser = GrokParser(
        components_regex=r'"k": (?P<k>\d+)',
        target_field="props",
        casts={"k": pa.int64()},
        error_tolerant=True,  # miss -> null k; SUM ignores it on both sides
    )
    ds = ds.map_batches(parser, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return grouped_count(ds, ["event_type"], count_alias="n", sum_cols={"k": "sum_k"})


_SQL_PARSE_EVENTS_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def q_parse_documents_source(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["lang", "source"])
    parser = GrokParser(
        components_regex=r"^src(?P<src_num>\d+)$",
        target_field="source",
        casts={"src_num": pa.int64()},
        error_tolerant=True,
    )
    ds = ds.map_batches(parser, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return grouped_count(ds, ["lang"], count_alias="n", sum_cols={"src_num": "sum_src"})


_SQL_PARSE_DOCUMENTS_SOURCE = """
SELECT lang, COUNT(*) AS n,
       CAST(SUM(CAST(NULLIF(regexp_extract(source, '^src(\\d+)$', 1), '') AS BIGINT)) AS BIGINT) AS sum_src
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Filter / projection
# ---------------------------------------------------------------------------

def q_filter_project_lineitem(sf_dir: str):
    ds = _tbl(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_quantity"]
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(t["l_quantity"], 25.0)), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True
    )
    f = FieldFilter(include_fields=(r"^l_(orderkey|partkey|quantity)$",))
    return f.apply(ds)


_SQL_FILTER_PROJECT_LINEITEM = """
SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_quantity < 25
"""


# ---------------------------------------------------------------------------
# Enrich (broadcast lookup join)
# ---------------------------------------------------------------------------

def q_enrich_customer_nation(sf_dir: str):
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    r_of = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    lookup = pa.table(
        {
            "c_nationkey": nation["n_nationkey"],
            "n_name": nation["n_name"],
            "r_name": pa.array([r_of[k] for k in nation["n_regionkey"].to_pylist()]),
        }
    )
    ds = _tbl(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ds = ds.map_batches(
        LookupEnricher(ray.put(lookup), key="c_nationkey"), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True
    )
    return grouped_count(ds, ["r_name", "n_name"], count_alias="n_customers")


_SQL_ENRICH_CUSTOMER_NATION = """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_join_orders_customers(sf_dir: str):
    """Large-large hash join (Ray ``Dataset.join``, hash-partitioned on the
    key — the shuffle-join path; broadcast enrich covers the small-side
    case).  Aggregated per market segment for a compact oracle compare."""
    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _tbl(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return grouped_count(joined, ["c_mktsegment"], count_alias="n_orders")


_SQL_JOIN_ORDERS_CUSTOMERS = """
SELECT c_mktsegment, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Route (fan-out rule cascade)
# ---------------------------------------------------------------------------

def q_semi_join_orders(sf_dir: str):
    """Semi join via broadcast key set (no shuffle of the big side)."""
    import pyarrow.parquet as pq
    from log_formatter_ray.ops.joins import semi_join

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    kept = semi_join(orders, "o_custkey", keys.combine_chunks())
    return grouped_count(kept, ["o_orderstatus"], count_alias="n")


_SQL_SEMI_JOIN_ORDERS = """
SELECT o_orderstatus, COUNT(*) AS n FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
"""


def q_anti_join_orders(sf_dir: str):
    import pyarrow.parquet as pq
    from log_formatter_ray.ops.joins import anti_join

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    orders = _tbl(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderstatus"])
    kept = anti_join(orders, "o_custkey", keys.combine_chunks())
    return grouped_count(kept, ["o_orderstatus"], count_alias="n")


_SQL_ANTI_JOIN_ORDERS = """
SELECT o_orderstatus, COUNT(*) AS n FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
"""


def q_asof_join_events(sf_dir: str):
    """As-of join: for each purchase, the most recent prior click by the
    same user (DuckDB has native ASOF JOIN for the oracle).  Both sides
    come from ONE streaming read (``asof_join_self`` tags purchase/click
    rows per batch) — no ``materialize()``, no two-branch double scan."""
    from log_formatter_ray.ops.asof import asof_join_self

    ev = _tbl(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    return asof_join_self(
        ev, by="user_id", on="ts", right_value_cols=["value"],
        left_filter=lambda t: pc.equal(t["event_type"], "purchase"),
        left_cols=["event_id", "user_id", "ts"],
        right_filter=lambda t: pc.equal(t["event_type"], "click"),
    )


_SQL_ASOF_JOIN_EVENTS = """
WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
     p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, c.ts AS ts_right, c.value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_approx_distinct_users(sf_dir: str):
    """HLL sketch estimate (±~2%); invariance tested against the exact
    count in tests — approximate by design, so rows-only here."""
    from log_formatter_ray.ops.sketch import approx_distinct

    ds = _tbl(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pa.table({"approx_distinct_users": pa.array([int(round(est))], pa.int64())})


def q_approx_users_per_type(sf_dir: str):
    """Per-key HLL (distributed sketch merge through a groupby — only 4 KB
    sketches shuffle); approximate by design → rows-only, tolerance-tested
    against exact counts in tests."""
    from log_formatter_ray.ops.sketch import approx_distinct_per_key

    ds = _tbl(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct_per_key(ds, "event_type", "user_id")


def q_approx_users_per_hour(sf_dir: str):
    """Windowed approximate distinct (tumbling hour × per-key HLL merge) —
    approximate by design → rows-only; per-window tolerance vs exact is
    asserted in tests."""
    from log_formatter_ray.ops.sketch import approx_distinct_per_window

    ds = _tbl(sf_dir, "events", columns=["ts", "user_id"])
    return approx_distinct_per_window(ds, "ts", "user_id", unit="hour")


def q_approx_quantiles_value(sf_dir: str):
    """ONE-pass t-digest quantiles of events.value (mergeable sketch,
    tree-merged like token_histogram) — approximate by design →
    rows-only; accuracy tolerance vs numpy is asserted in
    test_sketch_joins.py.  The exact continuous-value plan is
    ``grouped_quantile_binned`` (3 passes, bounded shuffle)."""
    from log_formatter_ray.ops.sketch import approx_quantiles

    ds = _tbl(sf_dir, "events", columns=["value"])
    p50, p95, p99 = approx_quantiles(ds, "value", [0.5, 0.95, 0.99])
    return pa.table(
        {
            "p50": pa.array([p50], pa.float64()),
            "p95": pa.array([p95], pa.float64()),
            "p99": pa.array([p99], pa.float64()),
        }
    )


def q_route_events(sf_dir: str):
    ds = _tbl(sf_dir, "events", columns=["event_type", "value"])
    router = Router(
        rules=(
            RouteRule(sink="sink_error", when=(Condition("event_type", "==", "error"),)),
            RouteRule(sink="sink_high", when=(Condition("value", ">=", 100.0),)),
        ),
        default_sink="sink_standard",
    )
    ds = ds.map_batches(router, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return grouped_count(ds, ["sink", "event_type"], count_alias="n")


_SQL_ROUTE_EVENTS = """
SELECT CASE WHEN event_type = 'error' THEN 'sink_error'
            WHEN value >= 100 THEN 'sink_high'
            ELSE 'sink_standard' END AS sink,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Aggregate
# ---------------------------------------------------------------------------

def q_aggregate_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["source", "lang", "n_chars"])
    return grouped_count(
        ds, ["source", "lang"], count_alias="n_docs", sum_cols={"n_chars": "sum_chars"}
    )


_SQL_AGGREGATE_DOCUMENTS = """
SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source, lang
"""


def q_tpch_q1_style(sf_dir: str):
    """Classic grouped aggregate (TPC-H Q1 shape, integer-safe columns)."""
    ds = _tbl(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    agg = grouped_count(
        ds,
        ["l_returnflag", "l_linestatus"],
        count_alias="n",
        sum_cols={"l_quantity": "sum_qty_f"},
    )

    def cast_qty(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.round(t["sum_qty_f"]), pa.int64())
        t = t.append_column("sum_qty", qty)
        return t.drop_columns(["sum_qty_f"])

    return agg.map_batches(cast_qty, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


_SQL_TPCH_Q1_STYLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_distinct_langs(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["lang"])
    # None-safe sort: a null lang is a legal DISTINCT value (SQL keeps it)
    vals = sorted(ds.unique("lang"), key=lambda x: (x is None, x or ""))
    return pa.table({"lang": pa.array(vals, pa.string())})


_SQL_DISTINCT_LANGS = """
SELECT DISTINCT lang FROM documents
"""


def q_union_counts(sf_dir: str):
    """ds.union: id streams from two tables concatenated then counted."""
    a = _tbl(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"id": t["doc_id"].combine_chunks()}), batch_format="pyarrow", batch_size=None
    )
    b = _tbl(sf_dir, "embeddings", columns=["vec_id"]).map_batches(
        lambda t: pa.table({"id": t["vec_id"].combine_chunks()}), batch_format="pyarrow", batch_size=None
    )
    n = a.union(b).count()
    return pa.table({"n": pa.array([n], pa.int64())})


_SQL_UNION_COUNTS = """
SELECT COUNT(*) AS n FROM (
  SELECT doc_id AS id FROM documents UNION ALL SELECT vec_id AS id FROM embeddings)
"""


def q_sort_limit_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


_SQL_SORT_LIMIT_DOCUMENTS = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
"""


def q_topk_users(sf_dir: str):
    ds = _tbl(sf_dir, "events", columns=["user_id"])
    agg = grouped_count(ds, ["user_id"], count_alias="n")
    return agg.sort(["n", "user_id"], descending=[True, False]).limit(10)


_SQL_TOPK_USERS = """
SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
ORDER BY n DESC, user_id LIMIT 10
"""


def q_heavy_hitters_users(sf_dir: str):
    """Top-10 users via the mergeable Misra-Gries summary — the
    bounded-memory alternative to ``topk_users``'s exact groupby (no
    value-keyed shuffle at all).  With distinct users < m the summary is
    EXACT, so this shares ``topk_users``'s oracle SQL; at web scale the
    same plan degrades gracefully to guaranteed-bracketed counts
    (test_sketch_joins.py pins the guarantee)."""
    from log_formatter_ray.ops.sketch import heavy_hitters

    ds = _tbl(sf_dir, "events", columns=["user_id"])
    vals, lower, upper = heavy_hitters(ds, "user_id", k=10, m=4096)
    # The shared exact-top-k oracle is only valid while the MG summary is
    # below capacity (distinct users < m ⇒ lower == upper).  sf0.1 has
    # ~1.5k distinct users but the corpus grows ~10× per sf step — fail
    # LOUDLY here rather than let an over-capacity run surface as an
    # inscrutable oracle value mismatch (ADVICE r4).
    if not np.array_equal(np.asarray(lower), np.asarray(upper)):
        raise AssertionError(
            "heavy_hitters_users: MG summary over capacity (m=4096 < "
            "distinct user_id) — counts are now bracketed, not exact, and "
            "the shared exact top-k oracle no longer applies; raise m to "
            ">= 4x the distinct-user estimate for this sf"
        )
    return pa.table(
        {
            "user_id": pa.array(list(vals)),  # source-typed (str or int)
            "n": pa.array(lower, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def q_dedup_exact_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(
        ds, coarse=_adaptive_coarse(sf_dir, hi=256)
    ).select_columns(["doc_id"])


_SQL_DEDUP_EXACT_DOCUMENTS = """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
"""


def q_minhash_clusters_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_clusters(ds, threshold=0.5,
                                coarse=_adaptive_coarse(sf_dir))


def q_simhash_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_simhash, batch_format="pyarrow", batch_size=None, zero_copy_batch=True).select_columns(
        ["doc_id", "simhash"]
    )


def q_embedding_dups(sf_dir: str):
    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=0.9, nbits=6)


def q_dsir_select_documents(sf_dir: str):
    """DSIR data selection (Xie et al. 2023): fit hashed-uni+bigram
    bag models over a TARGET domain (the ``lang='de'`` slice) and the
    raw corpus, score every document's log importance weight, keep the
    top 100 target-like docs.  Integer tree-reduced histograms + per-row
    reduceat make scores bit-deterministic across parallelism →
    rows-only (float weights; separation/invariance pinned in
    tests/test_dsir.py)."""
    from log_formatter_ray.ops.dsir import fit_dsir, score_dsir

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    target = ds.filter(expr="lang == 'de'")
    lr = fit_dsir(target, ds, buckets=8192)
    scored = score_dsir(ds, lr).select_columns(["doc_id", "dsir_logw"])
    return scored.sort(
        ["dsir_logw", "doc_id"], descending=[True, False]
    ).limit(100)


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, mark
    cosine-≥-threshold members WITHIN each cluster as semantic dups →
    (id, rep) groups.  Deterministic (hash-reservoir centroid sample,
    fixed seed, exact within-cluster comparison) but k-means-defined →
    rows-only; exactness is pinned against a brute-force oracle in
    tests/test_semdedup.py."""
    from log_formatter_ray.ops.semdedup import semdedup_clusters

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # the synthetic embeddings have no near-dups (max pairwise cosine
    # ~0.51), so union deterministic PLANTED twins: every vec_id%25==0
    # vector, first component nudged, id offset by 10**7 — each plant
    # must come back as a 2-group with rep = the original id
    def make_twin(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sel = ids % 25 == 0
        emb = batch["embedding"].combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = emb.flatten().to_numpy(zero_copy_only=False).copy()
        starts = off[:-1][np.diff(off) > 0]
        flat[starts] = flat[starts] + np.float32(1e-3)
        twins = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), pa.int32()),
            pa.array(flat, pa.float32()),
        )
        return pa.table({
            "vec_id": pa.array(ids + 10_000_000),
            "embedding": twins,
        }).filter(pa.array(sel))

    twins = ds.map_batches(
        make_twin, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return semdedup_clusters(
        ds.union(twins), n_clusters=8, threshold=0.95, coarse=16
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_jaccard_near_dups(sf_dir: str):
    """The n-gram-Jaccard dedup mode end to end: SimHash-banded candidate
    generation (distributed), then EXACT word-trigram Jaccard verification
    over only the candidate docs' texts (broadcast id-set fetch — bounded
    by the sparse candidate set, never the corpus)."""
    from log_formatter_ray.ops.dedup import simhash_candidates, verify_pairs_jaccard

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    sims = ds.map_batches(add_simhash, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    cands = simhash_candidates(sims, coarse=_adaptive_coarse(sf_dir))
    return verify_pairs_jaccard(ds, cands, threshold=0.8).select_columns(["a", "b"])


def q_dedup_best_documents(sf_dir: str):
    """Quality-aware near-dedup: MinHash-LSH clusters → re-elect each
    cluster's representative by highest ``n_chars`` (keep the LONGEST
    duplicate — the standard curation refinement over min-id) → drop the
    rest.  LSH-defined membership → rows-only; the election itself is
    pinned exactly in tests/test_dedup.py."""
    from log_formatter_ray.ops.dedup import (
        dedup_by_clusters,
        elect_cluster_reps,
        minhash_lsh_clusters,
    )

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    clusters = minhash_lsh_clusters(
        ds, threshold=0.6, coarse=_adaptive_coarse(sf_dir, hi=1024)
    ).materialize()
    scores = _tbl(sf_dir, "documents", columns=["doc_id", "n_chars"])
    best = elect_cluster_reps(clusters, scores, score_col="n_chars")
    return (
        dedup_by_clusters(ds, best)
        .select_columns(["doc_id"])
        .sort("doc_id")
    )


def q_dedup_near_documents(sf_dir: str):
    """The resumable near-dedup JOB end to end (cluster checkpoint +
    manifest-gated filtered rewrite) over a sharded copy of the documents
    table; returns the job totals.  LSH-defined → rows-only; resume and
    invalidation semantics are tested in tests/test_dedup_job.py."""
    import shutil

    import pyarrow.parquet as pq

    from log_formatter_ray.pipelines.dedup_job import run_dedup_job

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    src = os.path.join(base, "lfr_dedupjob_src", name)
    # Cache keyed on the SOURCE FILE's identity (mtime+size in the marker):
    # a regenerated documents.parquet invalidates the shards instead of
    # silently deduping stale data.  Shards are written to a temp dir
    # renamed into place so two concurrent first runs cannot observe a
    # half-written cache (rename is atomic; the loser's rename fails and
    # it uses the winner's identical shards).
    src_file = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_file)
    ident = f"{st.st_mtime_ns}:{st.st_size}"
    marker = os.path.join(src, "_SHARDED")

    def _marker_ok() -> bool:
        try:
            with open(marker) as f:
                return f.read() == ident
        except OSError:
            return False

    if not _marker_ok():
        shutil.rmtree(src, ignore_errors=True)
        tmp = tempfile.mkdtemp(prefix="lfr_shard_tmp_", dir=base)
        t = pq.read_table(src_file, columns=["doc_id", "text"])
        n_shards = 4
        step = (len(t) + n_shards - 1) // n_shards
        for s in range(n_shards):
            pq.write_table(
                t.slice(s * step, step).replace_schema_metadata(None),
                os.path.join(tmp, f"shard-{s:03d}.parquet"),
            )
        with open(os.path.join(tmp, "_SHARDED"), "w") as f:
            f.write(ident)
        os.makedirs(os.path.dirname(src), exist_ok=True)
        try:
            os.rename(tmp, src)
        except OSError:
            # concurrent creator won the rename; its shards are identical
            shutil.rmtree(tmp, ignore_errors=True)
            if not _marker_ok():
                raise
    out = tempfile.mkdtemp(prefix="lfr_dedupjob_", dir=base)
    try:
        res = run_dedup_job(src, out, threshold=0.5)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table(
        {
            "rows_in": pa.array([res.rows_in], pa.int64()),
            "rows_kept": pa.array([res.rows_kept], pa.int64()),
            "n_dup_ids": pa.array([res.n_dup_ids], pa.int64()),
        }
    )


def q_span_dup_documents(sf_dir: str):
    """Duplicated-SPAN detection via winnowing fingerprints (Schleimer et
    al. 2003): doc pairs sharing ≥3 selected fingerprints ⇒ sharing
    contiguous ≥(w+k−1)-word spans.  Rows-only (fingerprint-defined) but
    deterministic; selection guarantee and density are pinned in
    test_winnow.py."""
    from log_formatter_ray.ops.winnow import span_dup_pairs

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return span_dup_pairs(
        ds, k=5, w=4, min_shared=3, coarse=_adaptive_coarse(sf_dir)
    ).sort(["a", "b"])


def q_token_count_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(add_token_count, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    ds = ds.map_batches(add_bpe_ish_count, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return ds.select_columns(["doc_id", "n_words", "n_bpe"])


_SQL_TOKEN_COUNT_DOCUMENTS = f"""
SELECT doc_id, len(string_split(text, ' ')) AS n_words,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe
FROM documents
"""


def q_quality_stopwords(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(add_quality_stats, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return ds.select_columns(["doc_id", "n_words", "n_stop"])


_SQL_QUALITY_STOPWORDS = """
SELECT doc_id, len(string_split(text, ' ')) AS n_words,
       CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the','a','and','of','to','in','is','it'))) AS BIGINT) AS n_stop
FROM documents
"""


def q_fingerprint_documents(sf_dir: str):
    """md5-parity fingerprint (DuckDB-vectorized, ~1.4 M rows/s/core).
    SCALE NOTE: md5 is compute-bound ~270 MB/s per core; at 100 TB prefer
    ``rolling_fingerprint_documents`` (vectorized Karp–Rabin, order of
    magnitude faster) unless external md5 interop is required."""
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_fingerprint_md5, batch_format="pyarrow", batch_size=None, zero_copy_batch=True).select_columns(
        ["doc_id", "fp"]
    )


_SQL_FINGERPRINT_DOCUMENTS = """
SELECT doc_id, md5(text) AS fp FROM documents
"""


def q_clean_text_documents(sf_dir: str):
    from log_formatter_ray.ops.textstats import add_clean_text

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_clean_text, batch_format="pyarrow", batch_size=None, zero_copy_batch=True).select_columns(
        ["doc_id", "clean_text"]
    )


_SQL_CLEAN_TEXT_DOCUMENTS = r"""
SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS clean_text
FROM documents
"""


def q_quantize_embeddings(sf_dir: str):
    """Int8 quantization, oracle-checked: per-vector sum of quantized
    components (an order-insensitive content check of every q value) plus
    the float64 scale — both reproducible bit-for-bit in DuckDB double
    math (the op uses explicit round-half-up for exactly this reason)."""
    from log_formatter_ray.ops.ann import quantize_embeddings

    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ds.map_batches(quantize_embeddings, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def summarize(t: pa.Table) -> pa.Table:
        n = len(t)
        q = np.asarray(t["embedding_q8"].combine_chunks().flatten()).reshape(n, -1)
        return pa.table(
            {
                "vec_id": t["vec_id"].combine_chunks(),
                "q8_sum": pa.array(q.astype(np.int64).sum(axis=1)),
                "q_scale": t["q_scale"].combine_chunks(),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


_SQL_QUANTIZE_EMBEDDINGS = """
SELECT vec_id,
       CAST(list_sum(list_transform(embedding, x ->
         CAST(GREATEST(LEAST(FLOOR(CAST(x AS DOUBLE) / scale + 0.5), 127), -127)
              AS BIGINT))) AS BIGINT) AS q8_sum,
       scale AS q_scale
FROM (
  SELECT vec_id, embedding,
         (CASE WHEN amax = 0 THEN 1.0 ELSE amax END) / 127.0 AS scale
  FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) AS amax
    FROM embeddings))
"""


def q_langid_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LangIdScorer, batch_format="pyarrow", batch_size=None, concurrency=2
    ).select_columns(["doc_id", "pred_lang"])


# The language-ID heuristic is a deterministic rule (marker-word argmax with
# first-index tie-break, CJK override) — fully re-expressible in SQL.
_SQL_LANGID_DOCUMENTS = r"""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
            WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
            WHEN en >= de AND en >= fr AND en >= es THEN 'en'
            WHEN de >= fr AND de >= es THEN 'de'
            WHEN fr >= es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM (
  SELECT doc_id, text,
         len(list_filter(w, x -> x IN ('the','and','of','is','with'))) AS en,
         len(list_filter(w, x -> x IN ('der','und','die','ist','nicht'))) AS de,
         len(list_filter(w, x -> x IN ('le','et','les','des','est'))) AS fr,
         len(list_filter(w, x -> x IN ('el','los','las','es','una'))) AS es
  FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents))
"""


def q_vocab_coverage_documents(sf_dir: str):
    """Corpus-relative quality scoring: two-pass vocabulary coverage —
    pass 1 builds the corpus's top-500 word vocabulary (distributed
    partial counts, k-bounded driver collect), pass 2 scores every doc's
    in-vocab word count against the broadcast vocabulary.  Integer
    outputs → exact oracle."""
    from log_formatter_ray.ops.textstats import build_top_vocab, vocab_coverage

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = build_top_vocab(ds, k=500)
    return vocab_coverage(ds, vocab).select_columns(
        ["doc_id", "n_words", "n_in_vocab"]
    )


_SQL_VOCAB_COVERAGE_DOCUMENTS = """
WITH words AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS word
  FROM documents),
vocab AS (
  SELECT word FROM (
    SELECT word, COUNT(*) AS n FROM words GROUP BY word
    ORDER BY n DESC, word LIMIT 500)),
hits AS (
  SELECT w.doc_id, CAST(COUNT(v.word) AS BIGINT) AS n_in_vocab
  FROM words w LEFT JOIN vocab v ON w.word = v.word GROUP BY w.doc_id)
SELECT d.doc_id, len(string_split(coalesce(d.text, ''), ' ')) AS n_words,
       h.n_in_vocab
FROM documents d JOIN hits h ON d.doc_id = h.doc_id
"""


def q_rolling_fingerprint_documents(sf_dir: str):
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_rolling_fingerprint, batch_format="pyarrow", batch_size=None, zero_copy_batch=True).select_columns(
        ["doc_id", "fp_roll"]
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def q_window_events_hourly(sf_dir: str):
    ds = _tbl(sf_dir, "events", columns=["ts", "event_type"])
    return tumbling_window_count(ds, unit="hour", keys=["event_type"], count_alias="n")


_SQL_WINDOW_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS window, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_running_seq_events(sf_dir: str):
    from log_formatter_ray.ops.window import running_sequence_numbers

    ds = _tbl(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = running_sequence_numbers(ds)
    return out.select_columns(["event_id", "user_id", "k"])


_SQL_RUNNING_SEQ_EVENTS = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k
FROM events
"""


def q_sessionize_events(sf_dir: str):
    ds = _tbl(sf_dir, "events", columns=["user_id", "ts"])
    out = session_windows(ds, gap_s=1800.0, value_col=None)
    return out.select_columns(["user_id", "session_start", "session_end", "n_events"])


def q_sliding_window_events(sf_dir: str):
    from log_formatter_ray.ops.window import sliding_window_count

    ds = _tbl(sf_dir, "events", columns=["ts", "event_type"])
    return sliding_window_count(
        ds, size_s=3600, slide_s=900, keys=["event_type"], count_alias="n"
    )


_SQL_SLIDING_WINDOW_EVENTS = """
SELECT TIMESTAMP '1970-01-01 00:00:00'
         + ((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900) * INTERVAL '1 second'
         AS window,
       event_type, COUNT(*) AS n
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) s
GROUP BY 1, 2
"""


def q_top_users_per_hour(sf_dir: str):
    """Windowed top-k composition: tumbling-hour per-user counts (partial
    agg before the shuffle) → per-window top-3 users — the 'trending
    users per hour' shape, fully oracle-checked."""
    from log_formatter_ray.ops.window import topk_per_group

    ds = _tbl(sf_dir, "events", columns=["ts", "user_id"])
    counts = tumbling_window_count(
        ds, unit="hour", keys=["user_id"], count_alias="n"
    )
    return topk_per_group(counts, ["window"], "n", k=3, tiebreak_cols=["user_id"])


_SQL_TOP_USERS_PER_HOUR = """
SELECT "window", user_id, n FROM (
  SELECT "window", user_id, n,
         ROW_NUMBER() OVER (PARTITION BY "window" ORDER BY n DESC, user_id) AS rn
  FROM (SELECT date_trunc('hour', ts) AS "window", user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2))
WHERE rn <= 3
"""


def q_topk_users_per_type(sf_dir: str):
    from log_formatter_ray.ops.window import topk_per_group

    ds = _tbl(sf_dir, "events", columns=["event_type", "user_id"])
    counts = grouped_count(ds, ["event_type", "user_id"], count_alias="n")
    return topk_per_group(
        counts, ["event_type"], "n", k=3, tiebreak_cols=["user_id"]
    )


_SQL_TOPK_USERS_PER_TYPE = """
SELECT event_type, user_id, n FROM (
  SELECT event_type, user_id, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rn
  FROM (SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2))
WHERE rn <= 3
"""


_SQL_SESSIONIZE_EVENTS = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 1800 SECOND
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM d)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_split_counts_documents(sf_dir: str):
    """Deterministic train/val/test assignment by stable id hash (rows-only:
    the split function is hash-defined; stability across parallelism levels
    is asserted in tests)."""
    from log_formatter_ray.ops.sample import split_by_hash

    ds = _tbl(sf_dir, "documents", columns=["doc_id"])
    tagged = split_by_hash(ds, splits={"train": 0.9, "val": 0.05, "test": 0.05})
    return grouped_count(tagged, ["split"], count_alias="n")


def q_sample_documents(sf_dir: str):
    """Deterministic ~10% sample by stable id hash (rows-only)."""
    from log_formatter_ray.ops.sample import sample_by_hash

    ds = _tbl(sf_dir, "documents", columns=["doc_id"])
    n = sample_by_hash(ds, 0.1).count()
    return pa.table({"n_sampled": pa.array([int(n)], pa.int64())})


def q_p95_value_per_type(sf_dir: str):
    """Grouped DISCRETE 95th percentile: the sorted element at index
    ⌈0.95·n⌉−1 — an actual data value, so both engines return the same
    float bit pattern (an interpolated quantile_cont would be a computed
    float aggregate, which the oracle hash contract forbids).

    Scale plan: value-count partials + cumulative read-off
    (``grouped_quantile_disc``) — a hot event_type ships |distinct values|
    count rows, never its raw rows, so no worker ever gathers a key."""
    from log_formatter_ray.stages.aggregate import grouped_quantile_disc

    ds = _tbl(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantile_disc(ds, ["event_type"], "value", 0.95, out_col="p95")


_SQL_P95_VALUE_PER_TYPE = """
SELECT event_type, quantile_disc(value, 0.95) AS p95
FROM events GROUP BY event_type
"""


def q_range_join_events(sf_dir: str):
    """Range (interval) join: for each error event, the number of events by
    the same user in the following 5 minutes.  Both sides come from ONE
    streaming read (``range_count_join_self`` tags left+right rows per
    batch) — no ``materialize()`` of the events table, no two-branch
    union; then one coarse shuffle + two vectorized ``merge_asof`` rank
    lookups per partition (no pairwise expansion)."""
    from log_formatter_ray.ops.joins import range_count_join_self

    ev = _tbl(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    out = range_count_join_self(
        ev, by="user_id", on="ts", lo_s=0, hi_s=300,
        left_filter=lambda t: pc.equal(t["event_type"], "error"),
        left_cols=["event_id", "user_id", "ts"],
        count_alias="n_follow",
    )
    return out.select_columns(["event_id", "n_follow"])


_SQL_RANGE_JOIN_EVENTS = """
SELECT a.event_id, CAST(COUNT(b.ts) AS BIGINT) AS n_follow
FROM events a LEFT JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND
WHERE a.event_type = 'error'
GROUP BY a.event_id
"""


def q_median_chars_per_lang(sf_dir: str):
    """Exact grouped median WITHOUT gathering a key's rows in one worker:
    per-block (lang, n_chars) value-count partials collapse the corpus to a
    tiny (key, value, count) table; the median is read off the cumulative
    counts per key.  Skew-proof by construction (a hot lang still only
    contributes |distinct n_chars| rows)."""
    import pandas as pd

    ds = _tbl(sf_dir, "documents", columns=["lang", "n_chars"])
    counts = grouped_count(ds, ["lang", "n_chars"], count_alias="cnt")

    def med(g: pd.DataFrame) -> pd.DataFrame:
        lang = g["lang"].iloc[0]
        g = g[g["n_chars"].notna()].sort_values("n_chars")
        if not len(g):  # all-null group: SQL median(NULLs) is NULL
            return pd.DataFrame({"lang": [lang], "med_chars": [float("nan")]})
        c = g["cnt"].to_numpy(np.int64)
        v = g["n_chars"].to_numpy(np.float64)
        total = int(c.sum())
        cum = np.cumsum(c)
        if total % 2 == 1:
            m = float(v[np.searchsorted(cum, total // 2 + 1)])
        else:
            m = (
                float(v[np.searchsorted(cum, total // 2)])
                + float(v[np.searchsorted(cum, total // 2 + 1)])
            ) / 2.0
        return pd.DataFrame({"lang": [lang], "med_chars": [m]})

    return counts.groupby("lang").map_groups(med, batch_format="pandas")


_SQL_MEDIAN_CHARS_PER_LANG = """
SELECT lang, CAST(median(n_chars) AS DOUBLE) AS med_chars FROM documents GROUP BY lang
"""


def q_top_terms_per_lang(sf_dir: str):
    """Heavy text aggregation: corpus-wide word counts per language with
    per-block partial aggregation (each block collapses to its distinct
    (lang, word) pairs before the shuffle), then per-group top-3."""
    from log_formatter_ray.ops.window import topk_per_group

    ds = _tbl(sf_dir, "documents", columns=["lang", "text"])

    def word_counts(batch: pa.Table) -> pa.Table:
        # null texts contribute no words (unnest(NULL) semantics in the
        # SQL oracle); dropping them also keeps the repeat counts integral
        batch = batch.filter(pc.is_valid(batch["text"]))
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        per_row = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lang_rep = batch["lang"].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(batch)), per_row))
        )
        t = pa.table({"lang": lang_rep, "word": words.flatten()})
        agg = t.group_by(["lang", "word"]).aggregate([([], "count_all")])
        # rename by NAME — pyarrow versions differ on whether keys or
        # aggregates come first in the group_by output
        return agg.rename_columns(
            ["n" if c == "count_all" else c for c in agg.column_names]
        )

    partials = ds.map_batches(
        word_counts, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    from ray.data.aggregate import Sum

    counts = partials.groupby(["lang", "word"]).aggregate(Sum("n", alias_name="n"))
    return topk_per_group(counts, ["lang"], "n", k=3, tiebreak_cols=["word"])


_SQL_TOP_TERMS_PER_LANG = """
SELECT lang, word, n FROM (
  SELECT lang, word, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rn
  FROM (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY lang, word))
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """The query row selected EXPLICITLY by vec_id (parquet row-group
    filter) — scan order is not contractually id order, so ``take(1)``
    could silently pick a different query than the oracle's
    ``WHERE vec_id = 0``."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_ann_top10(sf_dir: str):
    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q0 = _query_vector(sf_dir, 0)
    out = brute_force_topk(ds, q0, k=10, exclude_ids={0}, concurrency=2)
    return pa.table({"vec_id": pa.array(out["vec_id"].tolist(), pa.int64())})


_SQL_ANN_TOP10 = """
SELECT vec_id FROM (
  SELECT vec_id,
         list_cosine_similarity(embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos
  FROM embeddings WHERE vec_id <> 0
  ORDER BY cos DESC, vec_id LIMIT 10)
"""


def q_ann_multi_top5(sf_dir: str):
    """Batched ANN: ONE broadcast of a 3-query matrix, one streaming pass,
    per-query top-5 (self excluded per query, like the SQL's e.vec_id <>
    q.qid — a global exclude set would wrongly hide a query vector from
    OTHER queries' results)."""
    qids = [0, 1, 2]
    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    Q = np.stack([_query_vector(sf_dir, i) for i in qids])
    out = brute_force_topk(ds, Q, k=6, concurrency=2)  # +1 overfetch for self
    qid_of = np.array(qids, dtype=np.int64)[out["query_idx"].to_numpy()]
    out = out.assign(qid=qid_of)
    out = out[out["vec_id"] != out["qid"]]
    top = (
        out.sort_values(["qid", "cos", "vec_id"], ascending=[True, False, True])
        .groupby("qid")
        .head(5)
    )
    return pa.table(
        {
            "qid": pa.array(top["qid"].to_numpy(), pa.int64()),
            "vec_id": pa.array(top["vec_id"].to_numpy(), pa.int64()),
        }
    )


_SQL_ANN_MULTI_TOP5 = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2))
SELECT qid, vec_id FROM (
  SELECT q.qid, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.qid
            ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id) AS rn
  FROM embeddings e, q WHERE e.vec_id <> q.qid)
WHERE rn <= 5
"""


def _ivf_top10(sf_dir: str, nprobe: int):
    ds = _tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q0 = _query_vector(sf_dir, 0)
    idx = IVFIndex(n_clusters=16, iters=5).fit(ds)
    assigned = idx.assign(ds)
    # +1 overfetch then drop the query vector itself, mirroring
    # q_ann_top10's exclude_ids={0}
    out = idx.search(assigned, q0, k=11, nprobe=nprobe)
    out = out[out["vec_id"] != 0].head(10)
    return pa.table({"vec_id": pa.array(out["vec_id"].tolist(), pa.int64())})


def q_ivf_ann_top10(sf_dir: str):
    """Exhaustive-probe IVF (nprobe = n_clusters): probing every cluster
    makes IVF EXACT, so this is oracle-checked against the same SQL as
    ``ann_top10`` — the index mechanics (fit, assign, probe, within-cluster
    brute force) all sit on the verified path."""
    return _ivf_top10(sf_dir, nprobe=16)


def q_ivf_ann_top10_pruned(sf_dir: str):
    """The pruned production path (nprobe=8 of 16): approximate by design →
    rows-only at the gate; recall/pruning invariants live in tests."""
    return _ivf_top10(sf_dir, nprobe=8)


# ---------------------------------------------------------------------------
# Flagship over the canonical sequences corpus + multimodal plumbing
# (not SQL-expressible: synthetic corpus / binary payloads → rows-only checks)
# ---------------------------------------------------------------------------

_SF_ROWS = {"sf0.001": 5_000, "sf0.01": 50_000, "sf0.1": 500_000}


def sequences_dir_for(sf_dir: str) -> tuple[str, int]:
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    rows = _SF_ROWS.get(name, 50_000)
    # tmpfs when available: bench variance on this box is dominated by disk
    # writeback, which a real cluster's per-node disks don't share
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, "lfr_sequences", name), rows


def q_flagship_sequences(sf_dir: str):
    from log_formatter_ray.fixtures import generate_sequences
    from log_formatter_ray.pipelines.flagship import run_flagship

    import shutil

    corpus, rows = sequences_dir_for(sf_dir)
    generate_sequences(corpus, rows, num_files=64)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = tempfile.mkdtemp(prefix="lfr_flagship_", dir=base)
    try:
        res = run_flagship(corpus, out)
    finally:
        shutil.rmtree(out, ignore_errors=True)  # only counts leave this query
    return res.counts


def q_media_decode(sf_dir: str):
    media = make_fake_media(300)
    ds = rd.from_arrow(media).map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    return ds.select_columns(["media_id", "width", "height", "n_pixels"])


def q_media_decode_real(sf_dir: str):
    """REAL image decode: actual BMP/PPM bytes through the dependency-free
    numpy codecs (no fake headers), actor-pool stage, small batches."""
    from log_formatter_ray.ops.multimodal import make_real_media

    media = make_real_media(300)
    imgs = rd.from_arrow(media).filter(
        expr="media_type == 'image'"
    ).map_batches(ImageDecoder, batch_format="pyarrow", batch_size=64, concurrency=2)
    return imgs.select_columns(["media_id", "width", "height", "n_pixels"])


def q_media_audio_near_dups(sf_dir: str):
    """Audio near-dup: tonal WAV clips with planted amplitude-scaled
    duplicate copies → dependency-free spectral embeddings (numpy rfft
    log-band, actor pool) → hyperplane-LSH cosine pairing — the
    multimodal near-dup composition (decode → featurize → LSH).
    Rows-only (embeddings+LSH defined by our kernels) but fully
    deterministic: the expected pair set {(i, 1000+i)} is asserted in
    test_multimodal.py."""
    from log_formatter_ray.ops.dedup import embedding_dup_pairs
    from log_formatter_ray.ops.multimodal import (
        SpectrogramFeaturizer,
        make_tonal_audio,
    )

    media = make_tonal_audio()
    embs = rd.from_arrow(media).map_batches(
        SpectrogramFeaturizer, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    ).select_columns(["media_id", "spec_embedding"])
    pairs = embedding_dup_pairs(
        embs, emb_col="spec_embedding", id_col="media_id",
        threshold=0.999, nbits=6, bands=4, coarse=16,
    )
    return pairs.select_columns(["a", "b"]).sort(["a", "b"])


# ---------------------------------------------------------------------------
# Token-sequence operators (canonical tokens payload; corpus is synthetic →
# rows-only checks, invariants tested in tests/test_tokens.py)
# ---------------------------------------------------------------------------

def _sequences_ds(sf_dir: str):
    from log_formatter_ray.fixtures import generate_sequences

    from log_formatter_ray.sources import clean

    corpus, rows = sequences_dir_for(sf_dir)
    generate_sequences(corpus, rows, num_files=64)
    return clean(rd.read_parquet_bulk(
        sorted(os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet"))
    ))


def q_chunk_sequences(sf_dir: str):
    from log_formatter_ray.ops.tokens import chunk_sequences

    ds = _sequences_ds(sf_dir)
    out = ds.map_batches(
        lambda b: chunk_sequences(b, max_len=512),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).select_columns(["n_tok"]).materialize()  # count+sum: one execution
    return pa.table(
        {
            "n_chunks": pa.array([out.count()], pa.int64()),
            "total_tokens": pa.array([int(out.sum("n_tok"))], pa.int64()),
        }
    )


def q_pack_sequences(sf_dir: str):
    from log_formatter_ray.ops.tokens import pack_sequences

    ds = _sequences_ds(sf_dir)
    # count/sum on the materialized stats columns — never an O(n_packs)
    # driver transfer (same plan as q_pack_sequences_stats below)
    out = ds.map_batches(
        lambda b: pack_sequences(b, context_len=2048),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).select_columns(["n_tok", "n_seqs"]).materialize()
    return pa.table(
        {
            "n_packs": pa.array([out.count()], pa.int64()),
            "n_seqs": pa.array([int(out.sum("n_seqs"))], pa.int64()),
            "total_tokens": pa.array([int(out.sum("n_tok"))], pa.int64()),
        }
    )


def q_pack_sequences_global(sf_dir: str):
    """Two-level GLOBAL packing (``pack_sequences_spill``): per-block FFD
    + streamed full-pack writes + remainder refine.  Oracle-checked via
    mass conservation (n_seqs, total_tokens — identical SQL to
    ``pack_sequences_stats``); the layout-dependent n_packs/fill are
    asserted in tests (fill ≥ per-batch fill, ≥ 0.99)."""
    import shutil

    from log_formatter_ray.ops.tokens import pack_sequences_spill

    ds = _sequences_ds(sf_dir)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = tempfile.mkdtemp(prefix="lfr_packglobal_", dir=base)
    try:
        res = pack_sequences_spill(ds, out, context_len=2048)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table(
        {
            "n_seqs": pa.array([res["n_seqs"]], pa.int64()),
            "total_tokens": pa.array([res["total_tokens"]], pa.int64()),
        }
    )


def q_decontaminate_sequences(sf_dir: str):
    """Token-level eval-set decontamination over the pretokenized corpus
    (the tokens-axis variant of ``decontaminate_documents``): eval set =
    sequences with seq % 97 == 0, corpus subset = seq % 5 == 0 (both
    deterministic doc_id functions so DuckDB reproduces the exact row
    sets; the subsets keep the oracle's list-slice n-gram explode to a
    few seconds).  A corpus row is dropped iff it shares ≥1 token 8-gram
    with the eval set.  Token payloads never shuffle — eval grams
    broadcast, the corpus streams through a searchsorted probe.
    Oracle-backed (exact list-equality SQL), gate-invisible by window
    size; 64-bit gram-hash collisions (≈10⁻⁶ per corpus) are the
    documented false-positive contract."""
    from log_formatter_ray.ops.decontam import (
        benchmark_token_ngram_hashes,
        decontaminate_tokens,
    )

    ds = _sequences_ds(sf_dir)

    def seq_mod(batch: pa.Table, mod: int) -> pa.Table:
        seq = pc.cast(
            pc.utf8_slice_codeunits(batch["doc_id"].combine_chunks(),
                                    start=-8),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(seq % mod == 0))

    eval_ds = ds.map_batches(
        lambda b: seq_mod(b, 97), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    corpus = ds.map_batches(
        lambda b: seq_mod(b, 5), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    hashes = benchmark_token_ngram_hashes(eval_ds, n=8)
    kept = decontaminate_tokens(corpus, hashes, n=8)
    return kept.select_columns(["doc_id"]).sort("doc_id")


def q_corpus_report_sequences(sf_dir: str):
    """One-pass corpus health report: ONE streaming map over the corpus
    emits a 1-row partial per block (counts, token mass, long/malformed
    tallies, min/max length, the block's distinct source set), and the
    driver folds kilobytes of partials — the pre-aggregate-inside-
    map_batches pattern with ZERO shuffle, however large the corpus.
    Every output is an integer scalar so the oracle is one SQL SELECT.
    Gate-invisible by necessity (unique SQL, window full since round 4) —
    allowlisted in tests/test_registry.py."""
    ds = _sequences_ds(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tok"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].combine_chunks()
        # RE2 ≡ DuckDB regexp_matches on this pattern (flagship parity)
        ok = pc.match_substring_regex(
            ids, r"^[0-9A-Za-z_]+/\d{4}-\d{2}-\d{2}/\d{4}-\d{8}$"
        ).to_numpy(zero_copy_only=False)
        srcs = pc.unique(batch["source"].combine_chunks())
        return pa.table({
            "n_docs": pa.array([len(batch)], pa.int64()),
            "total_tokens": pa.array([int(n_tok.sum())], pa.int64()),
            "n_long": pa.array([int((n_tok >= 1024).sum())], pa.int64()),
            "n_malformed": pa.array([int((~ok).sum())], pa.int64()),
            "min_len": pa.array(
                [int(n_tok.min()) if len(n_tok) else 0], pa.int64()),
            "max_len": pa.array(
                [int(n_tok.max()) if len(n_tok) else 0], pa.int64()),
            "sources": pa.array([srcs.to_pylist()],
                                pa.list_(pa.string())),
        })

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).to_pandas()  # one row per block — kilobytes at any corpus size
    sources = set()
    for s in parts["sources"]:
        sources.update(s)
    return pa.table({
        "n_docs": pa.array([int(parts["n_docs"].sum())], pa.int64()),
        "total_tokens": pa.array(
            [int(parts["total_tokens"].sum())], pa.int64()),
        "n_long": pa.array([int(parts["n_long"].sum())], pa.int64()),
        "n_malformed": pa.array(
            [int(parts["n_malformed"].sum())], pa.int64()),
        "min_len": pa.array([int(parts["min_len"].min())], pa.int64()),
        "max_len": pa.array([int(parts["max_len"].max())], pa.int64()),
        "n_sources": pa.array([len(sources)], pa.int64()),
    })


def q_top_dup_grams_sequences(sf_dir: str):
    """Top-10 most duplicated 12-token grams over the planted-span corpus
    (the boilerplate-span report): occurrence count + globally first
    (doc_id, pos) as the deterministic representative, ordered by
    (n DESC, doc_id, pos).  Oracle = SQL GROUP BY the gram list itself
    with a row_number()-elected representative.  Gate-invisible by
    necessity (unique SQL, window full since round 4) — allowlisted in
    tests/test_registry.py."""
    from log_formatter_ray.fixtures import generate_spanful_sequences
    from log_formatter_ray.ops.substr import duplicated_gram_stats
    from log_formatter_ray.sources import clean

    corpus, rows = spanful_dir_for(sf_dir)
    generate_spanful_sequences(corpus, rows, num_files=8, span_gram=12)
    ds = clean(rd.read_parquet_bulk(sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )))
    stats = duplicated_gram_stats(ds, gram_len=12, coarse=64)
    return stats.sort(
        ["n", "doc_id", "pos"], descending=[True, False, False]
    ).limit(10)


def q_length_buckets_sequences(sf_dir: str):
    """Sequence-length bucket histogram (dynamic-batching prep: group
    sequences into 128-token buckets so batches pad within a bucket, not
    across the corpus): per bucket, doc count + token mass.  Per-block
    partial aggregation (`grouped_count`) — the shuffle carries only
    (bucket, n, tok) partials.  Gate-invisible by necessity (unique SQL,
    window full since round 4) — allowlisted in tests/test_registry.py."""
    from log_formatter_ray.stages.aggregate import grouped_count

    ds = _sequences_ds(sf_dir)

    def bucketize(batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tok"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(n_tok // 128),
            "n_tok": pa.array(n_tok),
        })

    out = grouped_count(
        ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        keys=["bucket"], count_alias="n_docs",
        sum_cols={"n_tok": "total_tokens"},
    )
    return out


def q_contamination_score_sequences(sf_dir: str):
    """SCORED token-level decontamination: per corpus row (seq % 5 == 0),
    the COUNT of its 8-gram occurrences found in the eval set (seq % 97
    == 0) plus its total gram count — the "allow ≤x% incidental overlap"
    policy input, vs ``decontaminate_sequences``'s binary drop.  Same
    broadcast-probe plan (no shuffle); oracle counts exact-gram matches
    with the documented ~10⁻⁶ 64-bit hash-collision contract.
    Gate-invisible by necessity (unique SQL, window full since round 4) —
    allowlisted in tests/test_registry.py."""
    from log_formatter_ray.ops.decontam import (
        benchmark_token_ngram_hashes,
        contamination_counts_tokens,
    )

    ds = _sequences_ds(sf_dir)

    def seq_mod(batch: pa.Table, mod: int) -> pa.Table:
        seq = pc.cast(
            pc.utf8_slice_codeunits(batch["doc_id"].combine_chunks(),
                                    start=-8),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(seq % mod == 0))

    eval_ds = ds.map_batches(
        lambda b: seq_mod(b, 97), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    corpus = ds.map_batches(
        lambda b: seq_mod(b, 5), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    hashes = benchmark_token_ngram_hashes(eval_ds, n=8)
    return contamination_counts_tokens(corpus, hashes, n=8)


def q_minhash_clusters_sequences(sf_dir: str):
    """Near-dup clustering of the PRETOKENIZED corpus — MinHash shingles
    over token ids directly (no text round-trip; `MinHasher` detects the
    list<int32> column), banded LSH, distributed CC.

    The synthetic corpus has zero near-dups by construction, so the
    pipeline unions deterministic PLANTED twins (every seq%195==0 row of
    the seq%5==0 subset, first token perturbed, id suffixed "~nd") —
    each plant must come back as a 2-member cluster.  LSH-defined →
    rows-only; token-mode signature semantics are pinned in
    tests/test_dedup.py."""

    def seq_mod_sel(batch: pa.Table, mod: int) -> pa.Table:
        seq = pc.cast(
            pc.utf8_slice_codeunits(batch["doc_id"].combine_chunks(),
                                    start=-8),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(seq % mod == 0))

    def make_twin(batch: pa.Table) -> pa.Table:
        toks = batch["tokens"].combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = toks.flatten().to_numpy(zero_copy_only=False).copy()
        starts = off[:-1][np.diff(off) > 0]
        flat[starts] = (flat[starts] + 1) % 50257
        twins = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), pa.int32()),
            pa.array(flat, pa.int32()),
        )
        ids = pc.binary_join_element_wise(
            pc.cast(batch["doc_id"].combine_chunks(), pa.string()), "~nd", ""
        )
        return pa.table({"doc_id": ids, "tokens": twins})

    base = _sequences_ds(sf_dir).map_batches(
        lambda b: seq_mod_sel(b.select(["doc_id", "tokens"]), 5),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    twins = base.map_batches(
        lambda b: make_twin(seq_mod_sel(b, 195)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return minhash_lsh_clusters(
        base.union(twins), text_col="tokens", threshold=0.8,
        coarse=_adaptive_coarse(sf_dir, hi=1024), shuffle_mode="light",
    )


def q_pack_masks_sequences(sf_dir: str):
    """Model-ready packed batches end to end: chunk → pack → fixed-length
    ``input_ids`` / block-diagonal ``doc_index`` / ``loss_mask`` arrays,
    reduced to corpus totals (padding efficiency check: real vs pad
    tokens).  Not SQL-expressible → rows-only; the mask layout is pinned
    exactly in tests/test_tokens.py."""
    from log_formatter_ray.ops.tokens import (
        add_pack_masks,
        chunk_sequences,
        pack_sequences,
    )

    def stage(b: pa.Table) -> pa.Table:
        packed = pack_sequences(
            chunk_sequences(b.select(["doc_id", "tokens"]), max_len=512),
            context_len=2048,
        )
        out = add_pack_masks(packed, context_len=2048)
        lm = out["loss_mask"].combine_chunks()
        real = np.asarray(lm.flatten()).sum()
        return pa.table({
            "n_packs": pa.array([len(out)], pa.int64()),
            "real_tokens": pa.array([int(real)], pa.int64()),
            "pad_tokens": pa.array(
                [int(len(out) * 2048 - real)], pa.int64()),
        })

    partials = _sequences_ds(sf_dir).map_batches(
        stage, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    totals = partials.sum(["n_packs", "real_tokens", "pad_tokens"])
    return pa.table({
        k: pa.array([int(totals[f"sum({k})"])], pa.int64())
        for k in ("n_packs", "real_tokens", "pad_tokens")
    })


def q_bpe_pair_counts_sequences(sf_dir: str):
    """Top-20 adjacent token pairs — one BPE merge round / bigram
    statistics: per-block unique partials, coarse hash(pair) shuffle of
    (key, n) rows only, exact per-partition then global top-k.

    Runs on the deterministic seq%5==0 subset: this synthetic corpus is
    UNIFORM-random tokens — the op's worst case, where nearly every
    pair is unique and the partials barely compress (a real Zipfian
    corpus collapses orders of magnitude in the per-block unique).  The
    subset keeps the uncompressible-shuffle cost representative without
    dominating the bench.  Oracle-backed but gate-invisible (window
    full; ``tools/check_oracle.py`` verifies it)."""
    from log_formatter_ray.ops.tokens import bpe_pair_counts

    def subset(b: pa.Table) -> pa.Table:
        seq = pc.cast(
            pc.utf8_slice_codeunits(b["doc_id"].combine_chunks(), start=-8),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(seq % 5 == 0)).select(["tokens"])

    return bpe_pair_counts(
        _sequences_ds(sf_dir).map_batches(
            subset, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ),
        k=20, coarse=256,
    )


def q_token_budget_sample_sequences(sf_dir: str):
    """Data-mixing by TOKEN BUDGET: each source keeps its md5-ordered
    prefix of sequences while the running n_tok sum stays ≤ 100k — the
    "N tokens of web, M of code" mixture primitive.  Engine-neutral md5
    order → the DuckDB window-SUM oracle reproduces the identical rows.
    Oracle-backed but gate-invisible (window full;
    ``tools/check_oracle.py`` verifies it)."""
    from log_formatter_ray.ops.sample import token_budget_sample

    ds = _sequences_ds(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "source", "n_tok"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    return token_budget_sample(ds, "source", 100_000)


def q_fim_sequences(sf_dir: str):
    """Fill-in-the-middle transform (Bavarian et al. 2022) over the
    pretokenized corpus: hash-decided rows re-emitted as
    ``[PRE] prefix [SUF] suffix [MID] middle``.  Hash-derived cuts →
    layout/slice-invariant but not SQL-expressible → rows-only; the
    round-trip inverse is pinned in tests/test_tokens.py."""
    from log_formatter_ray.ops.tokens import fim_transform

    def stats(b: pa.Table) -> pa.Table:
        out = fim_transform(b.select(["doc_id", "tokens"]))
        return pa.table({
            "doc_id": out["doc_id"],
            "n_out": pc.list_value_length(out["tokens"]).cast(pa.int64()),
            "fim_applied": out["fim_applied"],
        })

    return _sequences_ds(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).sort("doc_id")


def q_remap_tokens_sequences(sf_dir: str):
    """Vocabulary remap over the pretokenized corpus: translate every
    token id through a broadcast LUT (tokenizer migration / vocab
    compaction), verified by a POSITION-WEIGHTED checksum per row — the
    LUT is arithmetic (``(id*2654435761) % V``) so DuckDB reproduces the
    mapping inline and the compare is exact without shipping list
    columns through the hash gate.  Oracle-backed but gate-invisible
    (window full; ``tools/check_oracle.py`` verifies it)."""
    from log_formatter_ray.fixtures import VOCAB_SIZE
    from log_formatter_ray.ops.tokens import remap_tokens

    lut = (
        (np.arange(VOCAB_SIZE, dtype=np.int64) * 2654435761) % VOCAB_SIZE
    ).astype(np.int32)
    lut_ref = ray.put(lut)

    def stats(b: pa.Table) -> pa.Table:
        out = remap_tokens(b.select(["doc_id", "tokens"]), ray.get(lut_ref))
        toks = out["tokens"].combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(off)
        w = np.arange(int(off[-1]), dtype=np.int64) - np.repeat(
            off[:-1], counts) + 1
        seg = np.zeros(len(counts), np.int64)
        nonempty = counts > 0
        if flat.size and nonempty.any():
            seg[nonempty] = np.add.reduceat(w * flat, off[:-1][nonempty])
        return pa.table({
            "doc_id": out["doc_id"],
            "n_tok": pa.array(counts),
            "tok_wsum": pa.array(seg),
        })

    return _sequences_ds(sf_dir).map_batches(
        stats, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).sort("doc_id")


def q_span_corrupt_sequences(sf_dir: str):
    """T5 span corruption over the pretokenized corpus: mask ~15% of
    each sequence in mean-3 spans, emit (inputs, targets) denoising
    pairs, report per-row sizes.  Hash-derived spans → deterministic
    under any layout, but not SQL-expressible → rows-only; the
    round-trip inverse is pinned in tests/test_tokens.py."""
    from log_formatter_ray.ops.tokens import span_corrupt_sequences

    def corrupt_stats(batch: pa.Table) -> pa.Table:
        out = span_corrupt_sequences(batch)
        return pa.table({
            "doc_id": out["doc_id"],
            "n_input": pc.list_value_length(out["inputs"]).cast(pa.int64()),
            "n_target": pc.list_value_length(out["targets"]).cast(
                pa.int64()),
        })

    return (
        _sequences_ds(sf_dir)
        .map_batches(corrupt_stats, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
        .sort("doc_id")
    )


def q_token_histogram_top(sf_dir: str):
    from log_formatter_ray.ops.tokens import token_histogram

    ds = _sequences_ds(sf_dir)
    hist = token_histogram(ds)
    top = np.argsort(-hist, kind="stable")[:10]
    return pa.table(
        {
            "token_id": pa.array(top.astype(np.int64)),
            "freq": pa.array(hist[top].astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# Oracles over the synthetic sequences corpus: DuckDB reads the SAME parquet
# shards the Ray pipelines read.  The glob depends on the sf dir, so these
# SQLs are generated per ``sf_dir`` at ``oracle_sql_for()`` CALL time —
# never frozen at import (an import-before-env-var caller would otherwise
# silently compare mismatched corpora).  queries() pre-generates the corpus
# in __ray_entry__ so either side can run first.
# ---------------------------------------------------------------------------


def oracle_sf_dir() -> str:
    """The sf dir the driver's oracle gate runs at — read at CALL time so
    callers that set GRAFT_ORACLE_SF_DIR after import still agree."""
    return os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _seq_oracle_sql(sf_dir: str) -> dict[str, str]:
    """The sequences-corpus oracle SQLs for one sf dir's corpus glob."""
    seq_glob = os.path.join(sequences_dir_for(sf_dir)[0], "*.parquet")
    span_glob = os.path.join(spanful_dir_for(sf_dir)[0], "*.parquet")
    return {
        # rank every 12-gram occurrence by (id, pos); cut the union of
        # rank>1 windows; reduce each doc to value-pinning scalars
        "exact_substr_sequences": f"""
WITH c AS (SELECT doc_id, tokens FROM read_parquet('{span_glob}')),
occ AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p,
           row_number() OVER (PARTITION BY list_slice(tokens, p, p + 11)
                              ORDER BY doc_id, p) AS rn
    FROM (SELECT doc_id, tokens,
                 unnest(range(1, len(tokens) - 10)) AS p FROM c))
  WHERE rn > 1
),
cov AS (
  SELECT DISTINCT doc_id, p + d AS tp
  FROM occ, (SELECT unnest(range(0, 12)) AS d)
),
toks AS (
  SELECT doc_id, unnest(tokens) AS t, generate_subscripts(tokens, 1) AS tp
  FROM c
),
kept AS (
  SELECT k.doc_id, k.t,
         row_number() OVER (PARTITION BY k.doc_id ORDER BY k.tp) AS np
  FROM toks k ANTI JOIN cov v ON k.doc_id = v.doc_id AND k.tp = v.tp
)
SELECT c.doc_id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_tok,
       CAST(len(c.tokens) - COALESCE(s.n, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(s.ws, 0) AS BIGINT) AS tok_wsum
FROM c LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n, SUM(np * t) AS ws FROM kept GROUP BY doc_id
) s USING (doc_id)
""",
        # top duplicated grams (boilerplate-span report)
        "top_dup_grams_sequences": f"""
WITH occ AS (
  SELECT doc_id, p - 1 AS pos, list_slice(tokens, p, p + 11) AS g
  FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens) - 10)) AS p
        FROM read_parquet('{span_glob}'))
),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n
  FROM occ GROUP BY g HAVING COUNT(*) >= 2
),
rep AS (
  SELECT g, doc_id, pos FROM (
    SELECT g, doc_id, pos,
           row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
    FROM occ) WHERE rn = 1
)
SELECT a.n, r.doc_id, CAST(r.pos AS BIGINT) AS pos
FROM agg a JOIN rep r USING (g)
ORDER BY a.n DESC, r.doc_id, r.pos LIMIT 10
""",
        # length-bucket histogram (128-token buckets)
        "length_buckets_sequences": f"""
SELECT CAST(n_tok // 128 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM read_parquet('{seq_glob}')
GROUP BY bucket
""",
        # one-pass corpus health report (all-integer scalars)
        "corpus_report_sequences": f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN n_tok >= 1024 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long,
       CAST(SUM(CASE WHEN NOT regexp_matches(doc_id,
              '^[0-9A-Za-z_]+/\\d{{4}}-\\d{{2}}-\\d{{2}}/\\d{{4}}-\\d{{8}}$')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
       CAST(MIN(n_tok) AS BIGINT) AS min_len,
       CAST(MAX(n_tok) AS BIGINT) AS max_len,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM read_parquet('{seq_glob}')
""",
        # scored decontamination: per-doc eval-overlap gram counts
        "contamination_score_sequences": f"""
WITH corpus AS (
  SELECT doc_id, tokens FROM read_parquet('{seq_glob}')
  WHERE CAST(right(doc_id, 8) AS BIGINT) % 5 = 0
),
eval AS (
  SELECT tokens FROM read_parquet('{seq_glob}')
  WHERE CAST(right(doc_id, 8) AS BIGINT) % 97 = 0
),
egrams AS (
  SELECT DISTINCT tokens[i:i+7] AS gr
  FROM eval, UNNEST(generate_series(1, len(tokens)-7)) AS t(i)
),
cgrams AS (
  SELECT doc_id, tokens[i:i+7] AS gr
  FROM corpus, UNNEST(generate_series(1, len(tokens)-7)) AS t(i)
),
hits AS (
  SELECT doc_id, COUNT(*) AS h FROM cgrams
  WHERE gr IN (SELECT gr FROM egrams) GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(GREATEST(len(c.tokens) - 7, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(hits.h, 0) AS BIGINT) AS n_hit
FROM corpus c LEFT JOIN hits USING (doc_id)
""",
        # sliding-window overlap chunking: closed-form count + mass
        "chunk_overlap_sequences": f"""
SELECT CAST(SUM(k) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN n_tok <= 256 THEN n_tok
                     ELSE 256 * (k - 1) + n_tok - (k - 1) * 128 END)
            AS BIGINT) AS total_tokens
FROM (SELECT n_tok,
             CASE WHEN n_tok <= 256 THEN 1
                  ELSE CAST(CEIL((n_tok - 256) / 128.0) AS BIGINT) + 1
             END AS k
      FROM read_parquet('{seq_glob}'))
""",
        # within-doc duplicate 3-gram counts over the same planted corpus
        "token_repetition_sequences": f"""
WITH g AS (
  SELECT doc_id, list_slice(tokens, p, p + 2) AS gr
  FROM (SELECT doc_id, tokens, unnest(range(1, len(tokens) - 1)) AS p
        FROM read_parquet('{span_glob}'))
)
SELECT c.doc_id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.n - s.d, 0) AS BIGINT) AS n_dup
FROM read_parquet('{span_glob}') c LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT gr) AS d FROM g
  GROUP BY doc_id
) s USING (doc_id)
""",
        "chunk_sequences": f"""
SELECT CAST(SUM(GREATEST(CAST(CEIL(n_tok / 512.0) AS BIGINT), 1)) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM read_parquet('{seq_glob}')
""",
        "token_histogram_top": f"""
SELECT CAST(t AS BIGINT) AS token_id, CAST(COUNT(*) AS BIGINT) AS freq
FROM (SELECT unnest(tokens) AS t FROM read_parquet('{seq_glob}'))
GROUP BY t ORDER BY freq DESC, token_id LIMIT 10
""",
        "decontaminate_sequences": f"""
WITH corpus AS (
  SELECT doc_id, tokens FROM read_parquet('{seq_glob}')
  WHERE CAST(right(doc_id, 8) AS BIGINT) % 5 = 0
),
eval AS (
  SELECT tokens FROM read_parquet('{seq_glob}')
  WHERE CAST(right(doc_id, 8) AS BIGINT) % 97 = 0
),
egrams AS (
  SELECT DISTINCT tokens[i:i+7] AS gr
  FROM eval, UNNEST(generate_series(1, len(tokens)-7)) AS t(i)
),
cgrams AS (
  SELECT doc_id, tokens[i:i+7] AS gr
  FROM corpus, UNNEST(generate_series(1, len(tokens)-7)) AS t(i)
),
bad AS (SELECT DISTINCT doc_id FROM cgrams WHERE gr IN (SELECT gr FROM egrams))
SELECT doc_id FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM bad)
""",
        # The flagship's parse → enrich → route semantics as one SQL
        # expression: grok-miss ⇒ quarantine; tier lookup (make_source_lookup:
        # every 3rd source premium, "misc" absent ⇒ null tier); n_tok >= 1024
        # ⇒ long; else standard.
        "flagship_sequences": f"""
SELECT sink, source, CAST(SUM(n) AS BIGINT) AS n FROM (
  SELECT source, COUNT(*) AS n,
         CASE WHEN NOT regexp_matches(doc_id,
                  '^[0-9A-Za-z_]+/\\d{{4}}-\\d{{2}}-\\d{{2}}/\\d{{4}}-\\d{{8}}$')
                THEN 'sink_quarantine'
              WHEN source IN ('web','wiki','forum','mail') THEN 'sink_premium'
              WHEN n_tok >= 1024 THEN 'sink_long'
              ELSE 'sink_standard' END AS sink
  FROM read_parquet('{seq_glob}')
  GROUP BY source, sink)
GROUP BY sink, source
""",
        "bpe_pair_counts_sequences": f"""
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT unnest(tokens[1:len(tokens)-1]) AS a,
         unnest(tokens[2:len(tokens)]) AS b
  FROM read_parquet('{seq_glob}')
  WHERE len(tokens) >= 2
    AND CAST(right(doc_id, 8) AS BIGINT) % 5 = 0)
GROUP BY a, b ORDER BY n DESC, a, b LIMIT 20
""",
        "token_budget_sample_sequences": f"""
SELECT doc_id, source, n_tok FROM (
  SELECT doc_id, source, n_tok,
         SUM(CAST(n_tok AS BIGINT)) OVER (
           PARTITION BY source ORDER BY md5(doc_id), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM read_parquet('{seq_glob}'))
WHERE c <= 100000
""",
        "remap_tokens_sequences": f"""
WITH s AS (
  SELECT doc_id,
         SUM(i * ((CAST(t AS BIGINT) * 2654435761) % 50257)) AS ws
  FROM (SELECT doc_id, unnest(tokens) AS t,
               unnest(range(1, len(tokens) + 1)) AS i
        FROM read_parquet('{seq_glob}'))
  GROUP BY doc_id
)
SELECT r.doc_id, CAST(len(r.tokens) AS BIGINT) AS n_tok,
       CAST(COALESCE(s.ws, 0) AS BIGINT) AS tok_wsum
FROM read_parquet('{seq_glob}') r LEFT JOIN s USING (doc_id)
""",
        "pack_sequences_stats": f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(SUM(LEAST(n_tok, 2048)) AS BIGINT) AS total_tokens
FROM read_parquet('{seq_glob}')
""",
        # global packing conserves the same mass as per-batch packing
        "pack_sequences_global": f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(SUM(LEAST(n_tok, 2048)) AS BIGINT) AS total_tokens
FROM read_parquet('{seq_glob}')
""",
        "dedup_sequences_corpus": f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(len(tokens)) AS BIGINT) AS total_tokens
FROM (SELECT DISTINCT tokens FROM read_parquet('{seq_glob}'))
""",
    }


def q_dedup_sequences_corpus(sf_dir: str):
    """Exact token-SEQUENCE dedup over the canonical corpus (keep min-id
    per distinct sequence, 128-bit double-hash identity, payload byte-
    exact through a pyarrow-only group stage); oracle = DuckDB DISTINCT
    over the list column (kept-row count + surviving token mass)."""
    from log_formatter_ray.ops.tokens import dedup_sequences

    ds = _sequences_ds(sf_dir)
    kept = dedup_sequences(ds, coarse=64).select_columns(["n_tok"]).materialize()
    n = kept.count()
    return pa.table(
        {
            "n_kept": pa.array([int(n)], pa.int64()),
            "total_tokens": pa.array(
                [int(kept.sum("n_tok")) if n else 0], pa.int64()
            ),
        }
    )


def spanful_dir_for(sf_dir: str) -> tuple[str, int]:
    """Planted-span ground-truth corpus dir + row count for one sf tier
    (ops/substr.py input — the uniform-random main corpus contains no
    natural >= L-token repeats, so span removal needs its own fixture)."""
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    rows = {"sf0.001": 400, "sf0.01": 2_000, "sf0.1": 8_000}.get(name, 2_000)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, "lfr_spanful", name), rows


def q_exact_substr_sequences(sf_dir: str):
    """ExactSubstr dedup (Lee et al. 2022) over a planted-span corpus: every
    duplicated >= 12-token span is cut from all but its globally first
    occurrence, then each doc reduces to value-pinning scalars (kept count,
    removed count, position-weighted token checksum — pins content AND
    order without hashing list columns).  Oracle = the same rank-and-cut in
    SQL (row_number over list_slice grams).  Gate-invisible by necessity
    (unique SQL, window full since round 4) — allowlisted in
    tests/test_registry.py, verified by tools/check_oracle.py."""
    from log_formatter_ray.fixtures import generate_spanful_sequences
    from log_formatter_ray.ops.substr import exact_substr_dedup
    from log_formatter_ray.ops.textstats import _per_row_sum
    from log_formatter_ray.sources import clean

    corpus, rows = spanful_dir_for(sf_dir)
    generate_spanful_sequences(corpus, rows, num_files=8, span_gram=12)
    ds = clean(rd.read_parquet_bulk(sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )))
    out = exact_substr_dedup(ds, gram_len=12, coarse=64)

    def summarize(batch: pa.Table) -> pa.Table:
        toks = batch["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        pos1 = np.arange(int(off[-1]), dtype=np.int64) - np.repeat(
            off[:-1], np.diff(off)
        ) + 1
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "n_tok": pa.array(np.diff(off)),
            "n_removed": pa.array(
                batch["n_removed"].combine_chunks()
                .to_numpy(zero_copy_only=False).astype(np.int64)
            ),
            "tok_wsum": pa.array(_per_row_sum(flat * pos1, off)),
        })

    return out.map_batches(
        summarize, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def q_chunk_overlap_sequences(sf_dir: str):
    """Sliding-window chunking with overlap (window 256 / stride 128) over
    the canonical corpus: chunk-count + token-mass conservation, both in
    CLOSED FORM on the SQL side (k = ceil((n-W)/S)+1; mass = W·(k-1) +
    n - (k-1)·S) so the oracle never explodes the token lists.  Chunk
    VALUES are pinned by tests/test_tokens.py round-trip checks (same
    split as pack_sequences_stats: mass oracle + layout tests).
    Gate-invisible by necessity (unique SQL, window full since round 4) —
    allowlisted in tests/test_registry.py."""
    from log_formatter_ray.ops.tokens import chunk_sequences_overlap

    ds = _sequences_ds(sf_dir)
    out = ds.map_batches(
        lambda b: chunk_sequences_overlap(b, window=256, stride=128),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).select_columns(["n_tok"]).materialize()
    return pa.table(
        {
            "n_chunks": pa.array([out.count()], pa.int64()),
            "total_tokens": pa.array([int(out.sum("n_tok"))], pa.int64()),
        }
    )


def q_token_repetition_sequences(sf_dir: str):
    """Within-sequence duplicate 3-gram counts (Gopher-style repetition
    signal on the TOKENS payload) over the planted-span corpus — the
    within-doc plants and chained copies make the dup counts non-trivial.
    Integer outputs (n_grams, n_dup) per doc; oracle = COUNT(*) -
    COUNT(DISTINCT gram) over exploded list_slice grams.  Gate-invisible
    by necessity (unique SQL, window full since round 4) — allowlisted in
    tests/test_registry.py, verified by tools/check_oracle.py."""
    from log_formatter_ray.fixtures import generate_spanful_sequences
    from log_formatter_ray.ops.substr import token_ngram_repetition
    from log_formatter_ray.sources import clean

    corpus, rows = spanful_dir_for(sf_dir)
    generate_spanful_sequences(corpus, rows, num_files=8, span_gram=12)
    ds = clean(rd.read_parquet_bulk(sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )))
    return ds.map_batches(
        lambda b: token_ngram_repetition(b, n=3),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def q_pack_sequences_stats(sf_dir: str):
    """The oracle-checkable half of packing: every input sequence is packed
    exactly once and every token (truncated at context_len) survives —
    mass-conservation invariants independent of the per-batch FFD layout
    (``pack_sequences`` itself stays rows-only because n_packs depends on
    the block structure)."""
    from log_formatter_ray.ops.tokens import pack_sequences

    ds = _sequences_ds(sf_dir)
    out = ds.map_batches(
        lambda b: pack_sequences(b, context_len=2048),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).select_columns(["n_tok", "n_seqs"]).materialize()
    return pa.table(
        {
            "n_seqs": pa.array([int(out.sum("n_seqs"))], pa.int64()),
            "total_tokens": pa.array([int(out.sum("n_tok"))], pa.int64()),
        }
    )


def q_distinct_embeddings(sf_dir: str):
    """Distinct-on-list via content hash (no list shuffle): a vectorized
    64-bit FNV fold over each vector's raw float32 bit pattern (stable
    across processes — builtin ``hash()`` is salted per process), partial
    per-block distinct, then a distributed groupby-count over the deduped
    hashes.  The driver sees only the final scalar."""
    ds = _tbl(sf_dir, "embeddings", columns=["embedding"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float32)
        n = len(batch)
        if not n:
            return pa.table({"h": pa.array([], pa.int64())})
        bits = flat.reshape(n, flat.size // n).view(np.uint32)
        h = np.full(n, 0xCBF29CE484222325, np.uint64)
        for j in range(bits.shape[1]):  # loop over DIM, vectorized over rows
            h = h * np.uint64(1099511628211) + bits[:, j]
        # per-block partial distinct — only deduped hashes shuffle
        return pa.table({"h": pa.array(np.unique(h).astype(np.int64))})

    deduped = ds.map_batches(
        hash_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    n = deduped.groupby("h").count().count()
    return pa.table({"n": pa.array([int(n)], pa.int64())})


_SQL_DISTINCT_EMBEDDINGS = """
SELECT COUNT(DISTINCT embedding) AS n FROM embeddings
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination, word explode, regex redaction
# ---------------------------------------------------------------------------

def q_decontaminate_documents(sf_dir: str):
    """Eval-set decontamination: documents sharing NO word 3-gram with the
    'benchmark' subset (doc_id % 97 = 0) survive.  Broadcast-small-side
    plan — the benchmark gram-hash set ships once via ``ray.put``; the
    corpus streams through one vectorized ``map_batches`` (ops/decontam.py)."""
    from log_formatter_ray.ops.decontam import benchmark_ngram_hashes, decontaminate

    def _mod_filter(keep_bench: bool):
        def fn(b: pa.Table) -> pa.Table:
            # no pc.modulo kernel in this pyarrow — numpy on the int64 column
            is_bench = b["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0
            return b.filter(pa.array(is_bench if keep_bench else ~is_bench))
        return fn

    bench = _tbl(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _mod_filter(True), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    grams = benchmark_ngram_hashes(bench, n=3)
    corpus = _tbl(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]
    ).map_batches(
        _mod_filter(False), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    clean = decontaminate(corpus, grams, n=3)
    return clean.select_columns(["doc_id", "lang", "n_chars"])


_SQL_DECONTAMINATE_DOCUMENTS = """
WITH corpus AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM corpus, UNNEST(generate_series(1, len(ws)-2)) AS t(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 97 <> 0
)
SELECT doc_id, lang, n_chars FROM corpus
WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


def q_explode_words(sf_dir: str):
    """Vectorized flat_map: every document exploded to (doc_id, pos, word)
    rows — exact positional oracle for the explode/unnest operator."""
    from log_formatter_ray.ops.textstats import explode_words

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(explode_words, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


_SQL_EXPLODE_WORDS = """
WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS word
FROM corpus, UNNEST(generate_series(1, len(ws))) AS t(i)
"""


def q_redact_documents(sf_dir: str):
    """Regex redaction (PII-scrub shape): RE2 on both sides, so the
    redacted text matches the oracle byte-for-byte."""
    from log_formatter_ray.ops.textstats import redact_text

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(redact_text, batch_format="pyarrow",
                        batch_size=None, zero_copy_batch=True)
    return ds.select_columns(["doc_id", "redacted", "n_redacted"])


_SQL_REDACT_DOCUMENTS = r"""
SELECT doc_id,
       regexp_replace(text, '\b(key|hash)\b', '<TERM>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '\b(key|hash)\b')) AS BIGINT) AS n_redacted
FROM documents
"""


def q_dup_ngram_documents(sf_dir: str):
    """Within-doc duplicate 3-gram counts (Gopher-style repetition quality
    signal): one vectorized pass, no shuffle — each row's stats depend only
    on its own text.  Integer counts so the oracle compares exactly; docs
    with fewer than 3 words are excluded to mirror the oracle's gram CTE."""
    from log_formatter_ray.ops.textstats import dup_ngram_stats

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(dup_ngram_stats, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
    return out.map_batches(
        lambda b: b.filter(pc.greater(b["n_grams"], 0)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


_SQL_DUP_NGRAM_DOCUMENTS = """
WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM corpus, UNNEST(generate_series(1, len(ws)-2)) AS t(i)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) - COUNT(DISTINCT g) AS BIGINT) AS n_dup_grams
FROM grams GROUP BY doc_id
"""


def q_dup_line_documents(sf_dir: str):
    """Gopher duplicate-LINE repetition signals (fraction of duplicate
    lines / of characters in duplicate lines — Rae et al. 2021 §A1.1),
    word-level (``sep=" "``) on this single-line corpus: one vectorized
    pass, no shuffle, integer counts so the oracle compares exactly.
    Oracle-backed but deliberately gate-invisible (the 50-slot window is
    full of unique SQLs; ``tools/check_oracle.py`` verifies it)."""
    from log_formatter_ray.ops.textstats import dup_line_stats

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: dup_line_stats(b, sep=" "),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


_SQL_DUP_LINE_DOCUMENTS = """
WITH l AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS line FROM documents
), per AS (
  SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
  FROM l GROUP BY doc_id, line
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_lines,
       CAST(SUM(p.c - 1) AS BIGINT) AS n_dup_lines,
       CAST(SUM((p.c - 1) * p.len) AS BIGINT) AS dup_line_chars,
       CAST(length(d.text) AS BIGINT) AS n_chars
FROM documents d JOIN per p ON d.doc_id = p.doc_id
GROUP BY d.doc_id, d.text
"""


def q_gopher_filter_documents(sf_dir: str):
    """Gopher-rules quality filter bundle (Rae et al. 2021 §A1.1) — word
    count, mean-word-length band, stopword floor, alphabetic-word floor,
    symbol cap — all integer arithmetic so the oracle compares exactly.
    The mean-word-length band is tightened to [3.5, 4.5] (``mwl2`` 7..9)
    so the rule discriminates on this corpus (the published 3..10 band
    passes 100% of it); op defaults remain the published bounds.
    Oracle-backed but gate-invisible (window full of unique SQLs;
    ``tools/check_oracle.py`` verifies it)."""
    from log_formatter_ray.ops.textstats import gopher_quality_filter

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: gopher_quality_filter(
            b, min_words=30, max_words=150, mwl2_lo=7, mwl2_hi=9,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).select_columns(
        ["doc_id", "n_words", "content_chars", "n_stop", "n_alpha", "n_sym"]
    )


_SQL_GOPHER_FILTER_DOCUMENTS = """
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
           AS content_chars,
         CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ('the','a','and','of','to','in','is','it')))
           AS BIGINT) AS n_stop,
         CAST(len(list_filter(string_split(text, ' '),
              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         CAST(length(text)
              - length(replace(replace(text, '#', ''), '…', ''))
           AS BIGINT) AS n_sym
  FROM documents
)
SELECT * FROM f
WHERE n_words BETWEEN 30 AND 150
  AND 7 * n_words <= 2 * content_chars AND 2 * content_chars <= 9 * n_words
  AND n_stop >= 2
  AND 5 * n_alpha >= 4 * n_words
  AND 10 * n_sym <= n_words
"""


def q_line_dedup_documents(sf_dir: str):
    """Corpus-wide exact duplicate-LINE removal (RefinedWeb §3.2.3 /
    Dolma paragraph dedup): keep only the globally FIRST occurrence of
    each distinct line (winner = smallest ``(doc_id, pos)``), rewrite
    docs from their surviving lines, drop fully-stripped docs.  Word
    granularity (``sep=" "``) on this single-line corpus — production
    uses ``sep="\\n"`` (same parameterization as ``dup_line_documents``).
    Only 28-byte ``(h1,h2,id,pos)`` rows shuffle; text never does.
    Oracle-backed but gate-invisible (window full of unique SQLs;
    ``tools/check_oracle.py`` verifies it)."""
    from log_formatter_ray.ops.linededup import global_line_dedup

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return global_line_dedup(ds, sep=" ", coarse=_adaptive_coarse(sf_dir))


_SQL_LINE_DEDUP_DOCUMENTS = """
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
"""


def q_dup_overlap_documents(sf_dir: str):
    """Cross-source duplication structure: exact-duplicate PAIR counts
    per unordered source pair — what a curation team reads before
    choosing source precedence.  The corpus has no natural exact dups,
    so deterministic CLONES are unioned in-pipeline (every doc_id%10==0
    row re-tagged source='clone', id offset 10**5) — the SQL oracle
    performs the identical union and self-join.  Oracle-backed but
    gate-invisible (window full; ``tools/check_oracle.py`` verifies
    it)."""
    from log_formatter_ray.ops.dedup import dup_overlap_matrix

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def clones(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sel = ids % 10 == 0
        return pa.table({
            "doc_id": pa.array(ids + 100_000),
            "text": b["text"].combine_chunks(),
            "source": pa.array(np.full(len(b), "clone", dtype=object),
                               pa.string()),
        }).filter(pa.array(sel))

    aug = ds.union(ds.map_batches(
        clones, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ))
    return dup_overlap_matrix(aug, coarse=_adaptive_coarse(sf_dir))


_SQL_DUP_OVERLAP_DOCUMENTS = """
WITH aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, 'clone' FROM documents
  WHERE doc_id % 10 = 0
)
SELECT least(a.source, b.source) AS src_a,
       greatest(a.source, b.source) AS src_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM aug a JOIN aug b ON a.text = b.text AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def q_dedup_lines_within_documents(sf_dir: str):
    """Within-document duplicate-line removal (the in-doc half of the
    line-dedup pair; word granularity on this single-line corpus): pure
    per-batch map, no shuffle, no state.  Oracle-backed but
    gate-invisible (window full; ``tools/check_oracle.py`` verifies
    it)."""
    from log_formatter_ray.ops.linededup import dedup_lines_within

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: dedup_lines_within(b, sep=" "),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


_SQL_DEDUP_LINES_WITHIN_DOCUMENTS = """
WITH exploded AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' ')) AS w,
         unnest(range(len(string_split(coalesce(text, ''), ' ')))) AS pos
  FROM documents
), ranked AS (
  SELECT doc_id, pos, w,
         row_number() OVER (PARTITION BY doc_id, w ORDER BY pos) AS rn
  FROM exploded
)
SELECT doc_id,
       string_agg(w, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS text,
       CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed
FROM ranked GROUP BY doc_id
"""


def q_incdedup_documents(sf_dir: str):
    """Incremental dedup against a persisted index: build the
    hash-partitioned (h1,h2) index from the ``doc_id%5==0`` slice (the
    "historical corpus"), then probe the WHOLE table as the arriving
    wave — exactly SQL ``NOT EXISTS`` against the slice.  Each probe
    task reads only its partition dir; the historical corpus is never
    re-read or shuffled.  ``within=False`` so semantics are the pure
    anti-probe (the wave-loop ``within=True`` path is pinned in
    tests/test_incdedup.py).  Oracle-backed but gate-invisible (window
    full of unique SQLs; ``tools/check_oracle.py`` verifies it)."""
    import shutil

    from log_formatter_ray.ops.incdedup import (
        build_dedup_index,
        dedup_against_index,
    )

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    def hist_slice(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 5 == 0))

    hist = ds.map_batches(
        hist_slice, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    path = os.path.join(
        "/tmp", "lfr_incdedup_idx_" + os.path.basename(
            os.path.normpath(sf_dir))
    )
    shutil.rmtree(path, ignore_errors=True)
    build_dedup_index(hist, path, parts=32)
    return dedup_against_index(ds, path, parts=32, within=False).sort(
        "doc_id"
    )


_SQL_INCDEDUP_DOCUMENTS = """
SELECT d.doc_id, d.text FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents i WHERE i.doc_id % 5 = 0 AND i.text = d.text
)
ORDER BY d.doc_id
"""


def q_stratified_sample_documents(sf_dir: str):
    """Exact-20-per-lang quota sample: per-block pre-top-k combiner, one
    coarse keyed shuffle of the survivors, selection = smallest md5(id)
    per stratum — engine-neutral, so the DuckDB window-function oracle
    reproduces the identical rows (hash-exact).  Oracle-backed but
    gate-invisible (window full; verified by tools/check_oracle.py)."""
    from log_formatter_ray.ops.sample import stratified_sample

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return stratified_sample(ds, "lang", k=20)


_SQL_STRATIFIED_SAMPLE_DOCUMENTS = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
  FROM documents
) WHERE r <= 20
"""


def q_unigram_ppl_documents(sf_dir: str):
    """Unigram-LM quality scoring (the CCNet perplexity-filter shape):
    distributed term counts → broadcast smoothed model → actor-pool
    scorer adding per-doc mean log₂-prob and perplexity.  Rows-only by
    design: the scores are float aggregates of a corpus-derived model."""
    from log_formatter_ray.ops.lm import score_corpus_unigram

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    return score_corpus_unigram(ds, max_vocab=50_000, concurrency=(1, 8))


def q_percentile_filter_documents(sf_dir: str):
    """Global percentile filter (two-pass, the at-scale plan): pass 1
    collapses the corpus to (value, count) partials and reads the exact
    discrete p75 of ``n_chars`` off the cumulative counts
    (``corpus_quantile_disc`` — raw rows never shuffle); pass 2 streams the
    corpus through a vectorized threshold filter with the scalar captured
    in the closure."""
    from log_formatter_ray.stages.aggregate import corpus_quantile_disc

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    thr = corpus_quantile_disc(ds, "n_chars", 0.75)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_chars"], thr))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


_SQL_PERCENTILE_FILTER_DOCUMENTS = """
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.75) FROM documents)
"""


def q_shuffle_documents(sf_dir: str):
    """Two-level epoch shuffle (training ingestion): seed-deterministic
    block-order randomization (metadata-only) + an in-block permutation
    keyed on (seed, block content hash) — no all-to-all, no byte moves.
    The oracle compares the ORDER-INSENSITIVE multiset: a correct shuffle
    returns exactly the input rows, so row count, schema, and value hash
    all match while the order is verifiably permuted (`test_sample.py`)."""
    from log_formatter_ray.ops.sample import two_level_shuffle

    ds = _tbl(sf_dir, "documents",
              columns=["doc_id", "text", "lang", "source", "n_chars"])
    return two_level_shuffle(ds, seed=123)


_SQL_SHUFFLE_DOCUMENTS = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


def q_curate_corpus_pipeline(sf_dir: str):
    """The full modern curation recipe as ONE composition — what a user
    of this engine actually chains at 100 TB: exact dedup (payload-light)
    → MinHash-LSH near-dedup → Gopher quality rules → exact-k per-lang
    quota sample.  Every stage is the already-verified operator; this
    query pins that they COMPOSE (schemas line up, laziness is
    preserved, no stage forces a driver materialization of the corpus).
    LSH-defined membership → rows-only."""
    from log_formatter_ray.ops.dedup import (
        dedup_by_clusters,
        exact_dedup,
        minhash_lsh_clusters,
    )
    from log_formatter_ray.ops.sample import stratified_sample
    from log_formatter_ray.ops.textstats import gopher_quality_filter

    coarse = _adaptive_coarse(sf_dir)
    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    d1 = exact_dedup(ds, mode="light", coarse=coarse)
    clusters = minhash_lsh_clusters(
        d1, threshold=0.8, coarse=_adaptive_coarse(sf_dir, hi=1024),
        shuffle_mode="light",
    )
    d2 = dedup_by_clusters(d1, clusters)
    d3 = d2.map_batches(
        lambda b: gopher_quality_filter(
            b, min_words=30, max_words=150, mwl2_lo=7, mwl2_hi=9,
        ),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).select_columns(["doc_id", "lang", "n_words"])
    return stratified_sample(d3, "lang", k=10)


def q_clean_corpus_pipeline(sf_dir: str):
    """The C4/Gopher-style corpus-cleaning recipe as ONE streaming chain —
    the composition a real training-data pipeline runs: language-ID →
    length floor → stopword-ratio floor → repetition (duplicate-3-gram)
    ceiling.  Every stage is a fused ``map_batches`` (the actor-pool
    langid stage included); thresholds are integer arithmetic so the
    DuckDB oracle compares exactly.  Keep iff: predicted 'en', ≥10 words,
    ≥2% stopwords (n_stop·50 ≥ n_words), ≤20% duplicate 3-grams
    (n_dup·5 ≤ n_grams)."""
    from log_formatter_ray.ops.textstats import (
        LangIdScorer,
        add_quality_stats,
        dup_ngram_stats,
    )

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    ds = ds.map_batches(add_quality_stats, batch_format="pyarrow",
                        batch_size=None, zero_copy_batch=True)

    def add_rep(b: pa.Table) -> pa.Table:
        st = dup_ngram_stats(b)  # positionally aligned with b's rows
        return b.append_column("n_grams", st["n_grams"]).append_column(
            "n_dup_grams", st["n_dup_grams"])

    ds = ds.map_batches(add_rep, batch_format="pyarrow", batch_size=None,
                        zero_copy_batch=True)
    ds = ds.map_batches(LangIdScorer, batch_format="pyarrow",
                        batch_size=None, concurrency=2)

    def keep(b: pa.Table) -> pa.Table:
        nw = b["n_words"].to_numpy(zero_copy_only=False)
        ns = b["n_stop"].to_numpy(zero_copy_only=False)
        ng = b["n_grams"].to_numpy(zero_copy_only=False)
        nd = b["n_dup_grams"].to_numpy(zero_copy_only=False)
        lang = b["pred_lang"].to_numpy(zero_copy_only=False)
        mask = (lang == "en") & (nw >= 10) & (ns * 50 >= nw) & (nd * 5 <= ng)
        return b.filter(pa.array(mask)).select(["doc_id", "lang", "n_words"])

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


_SQL_CLEAN_CORPUS_PIPELINE = r"""
WITH corpus AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS ws,
         string_split(lower(text), ' ') AS wl
  FROM documents
),
stats AS (
  SELECT doc_id, lang, text, len(ws) AS n_words,
         len(list_filter(ws, w -> w IN ('the','a','and','of','to','in','is','it'))) AS n_stop,
         len(list_filter(wl, x -> x IN ('the','and','of','is','with'))) AS en,
         len(list_filter(wl, x -> x IN ('der','und','die','ist','nicht'))) AS de,
         len(list_filter(wl, x -> x IN ('le','et','les','des','est'))) AS fr,
         len(list_filter(wl, x -> x IN ('el','los','las','es','una'))) AS es
  FROM corpus
),
langed AS (
  SELECT *,
         CASE WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
              WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
              WHEN en >= de AND en >= fr AND en >= es THEN 'en'
              WHEN de >= fr AND de >= es THEN 'de'
              WHEN fr >= es THEN 'fr'
              ELSE 'es' END AS pred_lang
  FROM stats
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM corpus, UNNEST(generate_series(1, len(ws)-2)) AS t(i)
),
rep AS (
  SELECT doc_id, COUNT(*) AS n_grams, COUNT(*) - COUNT(DISTINCT g) AS n_dup
  FROM grams GROUP BY doc_id
)
SELECT l.doc_id, l.lang, l.n_words
FROM langed l JOIN rep r USING (doc_id)
WHERE l.pred_lang = 'en' AND l.n_words >= 10
  AND l.n_stop * 50 >= l.n_words
  AND r.n_dup * 5 <= r.n_grams
"""


def q_tfidf_top_term(sf_dir: str):
    """TF-IDF top distinctive term per document, two-pass: pass 1 builds
    corpus document frequencies distributed (per-block distinct-words
    partials → one word-keyed Sum groupby; driver collect bounded by
    vocabulary size), broadcast once via ``ray.put``; pass 2 streams the
    corpus through a vectorized argmax under the exact integer ordering
    (tf desc, df asc, term asc) so the oracle compares exactly."""
    import ray as _ray

    from log_formatter_ray.ops.textstats import (
        build_doc_freq,
        top_distinctive_term,
    )

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "text"])
    ref = _ray.put(build_doc_freq(ds))

    def fn(b: pa.Table) -> pa.Table:
        vocab, df = _ray.get(ref)
        return top_distinctive_term(b, vocab, df)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


_SQL_TFIDF_TOP_TERM = """
WITH words AS (
  -- coalesce: the Ray side fill_nulls text to '' (a null-text doc yields
  -- a term='' row); without it the oracle would emit no row for that doc
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
  FROM documents
),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w),
ranked AS (
  SELECT tf.doc_id, tf.w, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.w ASC) AS rn
  FROM tf JOIN df USING (w)
)
SELECT doc_id, w AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM ranked WHERE rn = 1
"""


def q_mixture_sample_documents(sf_dir: str):
    """Weighted source mixing (rows-only: membership is hash-defined —
    exact rate logic and determinism are pinned in `test_sample.py`):
    rebalance three sources to 50/30/20 and report the per-source counts
    of the deterministic sample."""
    from ray.data.aggregate import Count

    from log_formatter_ray.ops.sample import sample_mixture

    ds = _tbl(sf_dir, "documents", columns=["doc_id", "source"])
    out = sample_mixture(ds, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return out.groupby("source").aggregate(Count(alias_name="n"))


def q_top_ngrams_corpus(sf_dir: str):
    """Corpus-wide most-repeated word 3-grams — the boilerplate detector
    (a gram that appears thousands of times across docs is template
    text).  Same scale shape as ``top_terms_per_lang``: per-block gram
    counts collapse each block to its DISTINCT grams before the one
    gram-keyed Sum shuffle; only top-k reaches the driver."""
    from ray.data.aggregate import Sum

    from log_formatter_ray.ops.decontam import _word_ngram_strings

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        grams, _ = _word_ngram_strings(batch["text"], 3)
        s = pd.Series(grams, dtype=object).value_counts()
        return pa.table({"gram": pa.array(s.index.to_numpy(object),
                                          pa.string()),
                         "n": pa.array(s.to_numpy(np.int64))})

    ds = _tbl(sf_dir, "documents", columns=["text"])
    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "gram"], descending=[True, False]).limit(20)


_SQL_TOP_NGRAMS_CORPUS = """
WITH corpus AS (SELECT string_split(text, ' ') AS ws FROM documents),
grams AS (
  SELECT array_to_string(ws[i:i+2], ' ') AS g
  FROM corpus, UNNEST(generate_series(1, len(ws)-2)) AS t(i)
)
SELECT g AS gram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY g
ORDER BY n DESC, gram ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Registry order matters: the driver's correctness gate exercises the FIRST
# 50 entries only.  There are 72 oracle-backed names — far more unique SQLs
# than the window holds — so the layout is:
#   * slots 1-50: oracle-backed, 50 distinct SQLs (includes
#     `heavy_hitters_users`, whose SQL is verbatim `topk_users`'s — the MG
#     sketch path is the more valuable gate occupant of the pair);
#   * slots 51+: `topk_users`, `ivf_ann_top10`, `pack_sequences_global`
#     reuse a gate entry's SQL VERBATIM (no oracle semantics lost); every
#     OTHER oracle query past the window carries a unique SQL and is
#     deliberately gate-invisible — each is listed in
#     tests/test_registry.py::GATE_INVISIBLE_UNIQUE_SQL with a docstring
#     justification (growing that set requires the same).
#     `tools/check_oracle.py` still verifies every entry regardless of
#     position; test_registry.py pins this layout.
QUERIES = {
    # --- oracle-backed (gate slots 1-50) ---
    "flagship_documents": q_flagship_documents,
    "flagship_sequences": q_flagship_sequences,
    "parse_events_props": q_parse_events_props,
    "parse_documents_source": q_parse_documents_source,
    "filter_project_lineitem": q_filter_project_lineitem,
    "enrich_customer_nation": q_enrich_customer_nation,
    "join_orders_customers": q_join_orders_customers,
    "semi_join_orders": q_semi_join_orders,
    "anti_join_orders": q_anti_join_orders,
    "asof_join_events": q_asof_join_events,
    "range_join_events": q_range_join_events,
    "p95_value_per_type": q_p95_value_per_type,
    "median_chars_per_lang": q_median_chars_per_lang,
    "top_terms_per_lang": q_top_terms_per_lang,
    "ann_multi_top5": q_ann_multi_top5,
    "route_events": q_route_events,
    "aggregate_documents": q_aggregate_documents,
    "tpch_q1_style": q_tpch_q1_style,
    "distinct_langs": q_distinct_langs,
    "union_counts": q_union_counts,
    "heavy_hitters_users": q_heavy_hitters_users,
    "dedup_sequences_corpus": q_dedup_sequences_corpus,
    "dedup_exact_documents": q_dedup_exact_documents,
    "token_count_documents": q_token_count_documents,
    "quality_stopwords": q_quality_stopwords,
    "fingerprint_documents": q_fingerprint_documents,
    "clean_text_documents": q_clean_text_documents,
    "quantize_embeddings": q_quantize_embeddings,
    "vocab_coverage_documents": q_vocab_coverage_documents,
    "langid_documents": q_langid_documents,
    "window_events_hourly": q_window_events_hourly,
    "sliding_window_events": q_sliding_window_events,
    "topk_users_per_type": q_topk_users_per_type,
    "top_users_per_hour": q_top_users_per_hour,
    "running_seq_events": q_running_seq_events,
    "sessionize_events": q_sessionize_events,
    "ann_top10": q_ann_top10,
    "chunk_sequences": q_chunk_sequences,
    "pack_sequences_stats": q_pack_sequences_stats,
    "token_histogram_top": q_token_histogram_top,
    "distinct_embeddings": q_distinct_embeddings,
    "decontaminate_documents": q_decontaminate_documents,
    "explode_words": q_explode_words,
    "redact_documents": q_redact_documents,
    "dup_ngram_documents": q_dup_ngram_documents,
    "percentile_filter_documents": q_percentile_filter_documents,
    "shuffle_documents": q_shuffle_documents,
    "clean_corpus_pipeline": q_clean_corpus_pipeline,
    "tfidf_top_term": q_tfidf_top_term,
    "top_ngrams_corpus": q_top_ngrams_corpus,
    # --- oracle-backed, SQL identical to a gate entry above ---
    "topk_users": q_topk_users,
    "ivf_ann_top10": q_ivf_ann_top10,
    "pack_sequences_global": q_pack_sequences_global,
    # --- oracle-backed, unique SQL, deliberately gate-invisible (more
    # unique SQLs than the 50 slots hold; see the layout comment above;
    # tools/check_oracle.py verifies them all) ---
    "sort_limit_documents": q_sort_limit_documents,
    "dup_line_documents": q_dup_line_documents,
    "gopher_filter_documents": q_gopher_filter_documents,
    "line_dedup_documents": q_line_dedup_documents,
    "incdedup_documents": q_incdedup_documents,
    "dedup_lines_within_documents": q_dedup_lines_within_documents,
    "dup_overlap_documents": q_dup_overlap_documents,
    "stratified_sample_documents": q_stratified_sample_documents,
    "decontaminate_sequences": q_decontaminate_sequences,
    "remap_tokens_sequences": q_remap_tokens_sequences,
    "token_budget_sample_sequences": q_token_budget_sample_sequences,
    "bpe_pair_counts_sequences": q_bpe_pair_counts_sequences,
    "pack_masks_sequences": q_pack_masks_sequences,
    "fim_sequences": q_fim_sequences,
    # --- rows-only (no SQL oracle by design) ---
    "split_counts_documents": q_split_counts_documents,
    "sample_documents": q_sample_documents,
    "approx_distinct_users": q_approx_distinct_users,
    "approx_users_per_type": q_approx_users_per_type,
    "approx_users_per_hour": q_approx_users_per_hour,
    "approx_quantiles_value": q_approx_quantiles_value,
    "dedup_near_documents": q_dedup_near_documents,
    "minhash_clusters_documents": q_minhash_clusters_documents,
    "simhash_documents": q_simhash_documents,
    "embedding_dups": q_embedding_dups,
    "semdedup_embeddings": q_semdedup_embeddings,
    "dsir_select_documents": q_dsir_select_documents,
    "span_corrupt_sequences": q_span_corrupt_sequences,
    "curate_corpus_pipeline": q_curate_corpus_pipeline,
    "jaccard_near_dups": q_jaccard_near_dups,
    "rolling_fingerprint_documents": q_rolling_fingerprint_documents,
    "span_dup_documents": q_span_dup_documents,
    "ivf_ann_top10_pruned": q_ivf_ann_top10_pruned,
    "media_decode": q_media_decode,
    "media_decode_real": q_media_decode_real,
    "media_audio_near_dups": q_media_audio_near_dups,
    "pack_sequences": q_pack_sequences,
    "mixture_sample_documents": q_mixture_sample_documents,
    "unigram_ppl_documents": q_unigram_ppl_documents,
    "dedup_best_documents": q_dedup_best_documents,
    "minhash_clusters_sequences": q_minhash_clusters_sequences,
    "exact_substr_sequences": q_exact_substr_sequences,
    "token_repetition_sequences": q_token_repetition_sequences,
    "chunk_overlap_sequences": q_chunk_overlap_sequences,
    "contamination_score_sequences": q_contamination_score_sequences,
    "corpus_report_sequences": q_corpus_report_sequences,
    "length_buckets_sequences": q_length_buckets_sequences,
    "top_dup_grams_sequences": q_top_dup_grams_sequences,
}

ORACLE_SQL = {
    "flagship_documents": _SQL_FLAGSHIP_DOCUMENTS,
    "parse_events_props": _SQL_PARSE_EVENTS_PROPS,
    "parse_documents_source": _SQL_PARSE_DOCUMENTS_SOURCE,
    "filter_project_lineitem": _SQL_FILTER_PROJECT_LINEITEM,
    "enrich_customer_nation": _SQL_ENRICH_CUSTOMER_NATION,
    "join_orders_customers": _SQL_JOIN_ORDERS_CUSTOMERS,
    "semi_join_orders": _SQL_SEMI_JOIN_ORDERS,
    "anti_join_orders": _SQL_ANTI_JOIN_ORDERS,
    "asof_join_events": _SQL_ASOF_JOIN_EVENTS,
    "range_join_events": _SQL_RANGE_JOIN_EVENTS,
    "p95_value_per_type": _SQL_P95_VALUE_PER_TYPE,
    "median_chars_per_lang": _SQL_MEDIAN_CHARS_PER_LANG,
    "top_terms_per_lang": _SQL_TOP_TERMS_PER_LANG,
    "ann_multi_top5": _SQL_ANN_MULTI_TOP5,
    "route_events": _SQL_ROUTE_EVENTS,
    "aggregate_documents": _SQL_AGGREGATE_DOCUMENTS,
    "tpch_q1_style": _SQL_TPCH_Q1_STYLE,
    "distinct_langs": _SQL_DISTINCT_LANGS,
    "union_counts": _SQL_UNION_COUNTS,
    "sort_limit_documents": _SQL_SORT_LIMIT_DOCUMENTS,
    "topk_users": _SQL_TOPK_USERS,
    # MG summary is exact below its capacity (distinct users < m at every
    # testdata scale), so the sketch query shares the exact top-k oracle
    "heavy_hitters_users": _SQL_TOPK_USERS,
    "dedup_exact_documents": _SQL_DEDUP_EXACT_DOCUMENTS,
    "token_count_documents": _SQL_TOKEN_COUNT_DOCUMENTS,
    "quality_stopwords": _SQL_QUALITY_STOPWORDS,
    "fingerprint_documents": _SQL_FINGERPRINT_DOCUMENTS,
    "clean_text_documents": _SQL_CLEAN_TEXT_DOCUMENTS,
    "window_events_hourly": _SQL_WINDOW_EVENTS_HOURLY,
    "sliding_window_events": _SQL_SLIDING_WINDOW_EVENTS,
    "topk_users_per_type": _SQL_TOPK_USERS_PER_TYPE,
    "top_users_per_hour": _SQL_TOP_USERS_PER_HOUR,
    "running_seq_events": _SQL_RUNNING_SEQ_EVENTS,
    "sessionize_events": _SQL_SESSIONIZE_EVENTS,
    "ann_top10": _SQL_ANN_TOP10,
    # exhaustive-probe IVF (nprobe = n_clusters) must equal the exact scan
    "ivf_ann_top10": _SQL_ANN_TOP10,
    "distinct_embeddings": _SQL_DISTINCT_EMBEDDINGS,
    "quantize_embeddings": _SQL_QUANTIZE_EMBEDDINGS,
    "langid_documents": _SQL_LANGID_DOCUMENTS,
    "vocab_coverage_documents": _SQL_VOCAB_COVERAGE_DOCUMENTS,
    "decontaminate_documents": _SQL_DECONTAMINATE_DOCUMENTS,
    "explode_words": _SQL_EXPLODE_WORDS,
    "redact_documents": _SQL_REDACT_DOCUMENTS,
    "dup_ngram_documents": _SQL_DUP_NGRAM_DOCUMENTS,
    "dup_line_documents": _SQL_DUP_LINE_DOCUMENTS,
    "gopher_filter_documents": _SQL_GOPHER_FILTER_DOCUMENTS,
    "line_dedup_documents": _SQL_LINE_DEDUP_DOCUMENTS,
    "incdedup_documents": _SQL_INCDEDUP_DOCUMENTS,
    "dedup_lines_within_documents": _SQL_DEDUP_LINES_WITHIN_DOCUMENTS,
    "dup_overlap_documents": _SQL_DUP_OVERLAP_DOCUMENTS,
    "stratified_sample_documents": _SQL_STRATIFIED_SAMPLE_DOCUMENTS,
    "percentile_filter_documents": _SQL_PERCENTILE_FILTER_DOCUMENTS,
    "shuffle_documents": _SQL_SHUFFLE_DOCUMENTS,
    "clean_corpus_pipeline": _SQL_CLEAN_CORPUS_PIPELINE,
    "tfidf_top_term": _SQL_TFIDF_TOP_TERM,
    "top_ngrams_corpus": _SQL_TOP_NGRAMS_CORPUS,
}


def oracle_sql_for(sf_dir: str | None = None) -> dict[str, str]:
    """The full oracle map: static SQLs + the sequences-corpus SQLs whose
    parquet glob is resolved for ``sf_dir`` (default: ``oracle_sf_dir()``)
    at call time."""
    out = dict(ORACLE_SQL)
    out.update(_seq_oracle_sql(sf_dir or oracle_sf_dir()))
    return out
