"""The flagship pipeline: parse → enrich → route → write + aggregate, resumable.

This is the rebuild's end-to-end job over the canonical ``sequences`` table
(doc_id, tokens:list<int32>, n_tok, source) — the Ray-Data-native form of
the reference's input → formatter-chain → output agent
(/root/reference/agent/manager.go:38-88):

    read_parquet(shards, include_paths)            # source (≈ Kafka topic)
      → map_batches(tag part_id)                   # lineage: file → partition
      → map_batches(GrokParser, pyarrow, 0-copy)   # grok parse, ok-mask
      → map_batches(LookupEnricher actor pool)     # broadcast dict enrich
      → map_batches(Router)                        # sink column (fan-out)
      → write_parquet(partition_cols=[part_id, sink])
    read back (pruned: part_id, sink, source, n_tok)
      → partial-agg → groupby                      # per-sink×source counts
    write per-partition lineage manifests (atomic) # checkpoint

Scale notes (the 100 TB design):
* No stage materializes the corpus: the main pass is a straight-line
  streaming map chain — zero shuffles; the only exchange is the tiny
  partial-aggregated counts.
* ``tokens`` stays a zero-copy Arrow ``list<int32>`` end to end
  (byte-exact per-row invariant; pandas is never touched).
* The aggregate is computed from the WRITTEN data with column pruning
  (part_id/sink/source/n_tok only — the token payload is never re-read),
  which both avoids recomputing the transform chain and checksums what
  actually landed on disk.
* Resume granularity is the input file (hive dir per partition), so a
  rerun at a different parallelism level skips exactly the same work.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from log_formatter_ray.fixtures import make_source_lookup
from log_formatter_ray.stages.aggregate import grouped_count
from log_formatter_ray.stages.enrich import LookupEnricher
from log_formatter_ray.stages.parse import GrokParser, LabelSpec
from log_formatter_ray.stages.route import Condition, Router, RouteRule
from log_formatter_ray.state.manifest import (
    PartitionManifest,
    assign_partitions,
    clean_partition_output,
    load_manifests,
    write_manifest,
)

# FIXTURES.md §1: doc_id = "{source}/{day}/{shard:04d}-{seq:08d}".
# ``src_`` is a discard group (extracted, label-usable, not emitted) —
# the reference's `_` convention (parser.go:90-92,100-102).
DOC_ID_PATTERN = (
    r"^(?P<src_>\w+)/(?P<day>\d{4}-\d{2}-\d{2})/(?P<shard>\d{4})-(?P<seq>\d{8})$"
)
DAY_LABELS = (LabelSpec(component="day", regexprs=(r"^(?P<year>\d{4})-",)),)

# FIXTURES.md §3 routing rules; quarantine first so parse-failed rows never
# match the content rules.
FLAGSHIP_RULES = (
    RouteRule(sink="sink_quarantine", when=(Condition("_ok", "==", False),)),
    RouteRule(sink="sink_premium", when=(Condition("tier", "==", "premium"),)),
    RouteRule(sink="sink_long", when=(Condition("n_tok", ">=", 1024),)),
)


@dataclass
class FlagshipResult:
    out_dir: str
    manifests: dict[str, PartitionManifest]
    processed_partitions: list[str]
    skipped_partitions: list[str]
    counts: "pa.Table"  # per (sink, source): n rows, sum_n_tok
    rows_in: int = 0
    rows_routed: int = 0
    token_bytes: int = 0
    stats: str = ""
    extra: dict = field(default_factory=dict)


def _basename_tagger(files: list[str]):
    """Vectorized path → part_id tagging; matched on basename so scheme /
    mount differences in resolved paths don't matter."""
    parts = assign_partitions(files)
    base_to_pid = {
        os.path.basename(f): pid for pid, fs in parts.items() for f in fs
    }
    keys = pa.array(list(base_to_pid.keys()), pa.string())
    vals = pa.array(list(base_to_pid.values()), pa.string())

    def tag(batch: pa.Table) -> pa.Table:
        base = pc.extract_regex(batch["path"], r"(?P<b>[^/]+)$")
        idx = pc.index_in(pc.struct_field(base, "b"), value_set=keys)
        pid = pc.take(vals, idx)
        batch = batch.append_column("part_id", pid)
        return batch.drop_columns(["path"])

    return tag


def build_flagship_dataset(
    files: list[str],
    lookup_ref,
    *,
    error_tolerant: bool = True,
    enrich_concurrency=None,
    override_num_blocks: int | None = None,
) -> "rd.Dataset":
    """The lazy transform chain (no consumption): read → tag → parse →
    enrich → route."""
    ds = rd.read_parquet(
        files, include_paths=True, override_num_blocks=override_num_blocks
    )
    ds = ds.map_batches(_basename_tagger(files), batch_format="pyarrow")

    parser = GrokParser(
        components_regex=DOC_ID_PATTERN,
        target_field="doc_id",
        labels=DAY_LABELS,
        error_tolerant=error_tolerant,
        ok_field="_ok" if error_tolerant else None,
    )
    ds = ds.map_batches(parser, batch_format="pyarrow", zero_copy_batch=True)

    # Stateful enrich: actor pool, broadcast dict resolved once per actor.
    # Autoscaling (1, 8) by default: the stage is cheap (dictionary index_in),
    # so a small pool never starves the parse/write stages of CPUs.
    kwargs = {"concurrency": enrich_concurrency or (1, 8)}
    ds = ds.map_batches(
        LookupEnricher,
        fn_constructor_args=(lookup_ref,),
        fn_constructor_kwargs={"key": "source"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        **kwargs,
    )

    rules = FLAGSHIP_RULES if error_tolerant else FLAGSHIP_RULES[1:]
    router = Router(rules=rules, default_sink="sink_standard", sink_field="sink")
    ds = ds.map_batches(router, batch_format="pyarrow", zero_copy_batch=True)
    if error_tolerant:
        ds = ds.drop_columns(["_ok"])
    return ds


def run_flagship(
    input_path: str | list[str],
    out_dir: str,
    *,
    lookup: pa.Table | None = None,
    resume: bool = True,
    error_tolerant: bool = True,
    enrich_concurrency=None,
    override_num_blocks: int | None = None,
    min_rows_per_file: int | None = None,
) -> FlagshipResult:
    """Run (or resume) the flagship job.  Ray must already be initialised."""
    if isinstance(input_path, str):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = sorted(input_path)
    if not files:
        raise ValueError(f"no parquet inputs under {input_path!r}")

    parts = assign_partitions(files)
    done = load_manifests(out_dir) if resume else {}
    # Drop stale manifests that no longer correspond to current inputs.
    done = {pid: m for pid, m in done.items() if pid in parts}
    pending = {pid: fs for pid, fs in parts.items() if pid not in done}

    data_dir = os.path.join(out_dir, "data")
    for pid in pending:
        clean_partition_output(data_dir, pid)

    stats = ""
    if pending:
        pending_files = sorted(f for fs in pending.values() for f in fs)
        lookup_ref = ray.put(lookup if lookup is not None else make_source_lookup())
        ds = build_flagship_dataset(
            pending_files,
            lookup_ref,
            error_tolerant=error_tolerant,
            enrich_concurrency=enrich_concurrency,
            override_num_blocks=override_num_blocks,
        )
        ds.write_parquet(
            data_dir,
            partition_cols=["part_id", "sink"],
            min_rows_per_file=min_rows_per_file,
        )
        stats = ds.stats()

        # Lineage counts from the WRITTEN data, token payload never re-read.
        written = rd.read_parquet(data_dir)
        written = written.select_columns(["part_id", "sink", "source", "n_tok"])
        agg = grouped_count(
            written,
            ["part_id", "sink", "source"],
            count_alias="n",
            sum_cols={"n_tok": "sum_n_tok"},
        ).to_pandas()

        rows_in_per_file = {f: pq.read_metadata(f).num_rows for f in pending_files}
        for pid, fs in pending.items():
            sub = agg[agg["part_id"] == pid]
            sink_counts = sub.groupby("sink")["n"].sum().to_dict()
            ss_counts = {
                f"{r.sink}|{r.source}": int(r.n) for r in sub.itertuples()
            }
            rows_in = sum(rows_in_per_file[f] for f in fs)
            routed = int(sub["n"].sum())
            token_sum = int(sub["sum_n_tok"].sum())
            m = PartitionManifest(
                part_id=pid,
                input_files=[os.path.basename(f) for f in fs],
                rows_in=rows_in,
                rows_routed=routed,
                rows_dropped=rows_in - routed,
                sink_counts={k: int(v) for k, v in sink_counts.items()},
                sink_source_counts=ss_counts,
                token_sum=token_sum,
                token_bytes=4 * token_sum,
            )
            write_manifest(out_dir, m)
            done[pid] = m

    # Corpus-level result assembled from ALL manifests (incl. prior runs).
    agg_counts: dict[tuple[str, str], list[int]] = {}
    rows_in = rows_routed = token_sum = 0
    for m in done.values():
        rows_in += m.rows_in
        rows_routed += m.rows_routed
        token_sum += m.token_sum
        for key, n in m.sink_source_counts.items():
            sink, source = key.split("|", 1)
            agg_counts.setdefault((sink, source), [0])[0] += n
    counts = pa.table(
        {
            "sink": pa.array([k[0] for k in sorted(agg_counts)], pa.string()),
            "source": pa.array([k[1] for k in sorted(agg_counts)], pa.string()),
            "n": pa.array([agg_counts[k][0] for k in sorted(agg_counts)], pa.int64()),
        }
    )
    return FlagshipResult(
        out_dir=out_dir,
        manifests=done,
        processed_partitions=sorted(pending),
        skipped_partitions=sorted(set(parts) - set(pending)),
        counts=counts,
        rows_in=rows_in,
        rows_routed=rows_routed,
        token_bytes=4 * token_sum,
        stats=stats,
    )
