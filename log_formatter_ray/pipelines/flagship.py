"""The flagship pipeline: parse → enrich → route → write + aggregate, resumable.

This is the rebuild's end-to-end job over the canonical ``sequences`` table
(doc_id, tokens:list<int32>, n_tok, source) — the Ray-Data-native form of
the reference's input → formatter-chain → output agent
(/root/reference/agent/manager.go:38-88):

    read_parquet(shards, include_paths)              # source (≈ Kafka topic)
      → map_batches(tag part_id)                     # lineage: file → partition
      → map_batches(GrokParser, pyarrow, 0-copy)     # grok parse, ok-mask
      → map_batches(LookupEnricher)                  # broadcast dict enrich
      → map_batches(RouteAndWrite)                   # sink column + partitioned
                                                     #   parquet write + PARTIAL
                                                     #   (part,sink,source) counts
      → groupby(part_id, sink, source).sum()         # tiny partials only
    write per-partition lineage manifests (atomic)   # checkpoint

Scale design (the 100 TB concerns, explicitly):

* ONE streaming pass over the corpus, zero shuffles of row data.  The
  route stage writes its own partition files AND emits only per-block
  partial count rows (a few hundred bytes per block); the final groupby
  exchanges partials, never rows.  There is no separate read-back pass.
* ``tokens`` stays a zero-copy Arrow ``list<int32>`` end to end (byte-exact
  per-row invariant; pandas never touched).
* Enrich is a broadcast dictionary (``ray.put`` once, zero-copy ``ray.get``
  per worker from shared memory) applied in elastic stateless tasks so Ray
  fuses read→parse→enrich→route+write into one task chain — no actor-pool
  concurrency cap in the middle of the hot path.  ``enrich_mode="actors"``
  keeps the actor-pool form for stages whose setup is genuinely expensive
  (models, indexes); for a dict lookup the setup is ~zero and tasks win.
* Block-level output files are named by content (id-range hash), so Ray
  task retries overwrite the same file instead of duplicating rows.
* Resume granularity is the input file (hive dir per partition), so a rerun
  at a different parallelism level skips exactly the same completed work.
"""

from __future__ import annotations

import glob
import hashlib
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from log_formatter_ray.fixtures import make_source_lookup
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
    counts: "pa.Table"  # per (sink, source): n rows
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


class RouteAndWrite:
    """Fused route + partitioned write + partial count.

    Per batch: compute the ``sink`` column, write one parquet file per
    (part_id, sink) slice of the batch under the hive layout
    ``data/part_id=<pid>/sink=<sink>/``, and return ONLY the partial counts
    (part_id, sink, source, n, sum_n_tok) — so the downstream aggregate
    exchanges a few rows per block instead of the corpus.

    Idempotence: the output filename is a hash of (part_id, sink, id range,
    row count), so a retried task overwrites its own file byte-for-byte
    (inputs are deterministic) instead of appending duplicates.
    """

    def __init__(self, router: Router, data_dir: str, drop_cols: tuple[str, ...] = (),
                 write_outputs: bool = True):
        self.router = router
        self.data_dir = data_dir
        self.drop_cols = drop_cols
        self.write_outputs = write_outputs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        batch = self.router(batch)
        if self.drop_cols:
            batch = batch.drop_columns([c for c in self.drop_cols if c in batch.column_names])

        out_parts, out_sinks, out_sources, out_n, out_toks = [], [], [], [], []
        if len(batch) == 0:
            return pa.table(
                {
                    "part_id": pa.array([], pa.string()),
                    "sink": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_n_tok": pa.array([], pa.int64()),
                }
            )
        # Group the batch by (part_id, sink) with ONE take instead of one
        # full-table filter per key (K filters = K scans of the token
        # payload; a single stable argsort + contiguous slices costs one).
        combo = pc.binary_join_element_wise(batch["part_id"], batch["sink"], "\x00")
        dict_arr = pc.dictionary_encode(combo)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        keys_dict = dict_arr.dictionary
        if len(keys_dict) > 1:
            order = np.argsort(codes, kind="stable")
            batch = batch.take(pa.array(order))
            codes = codes[order]
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, len(codes)]
        for s, e in zip(starts, ends):
            pid, sink = keys_dict[int(codes[s])].as_py().split("\x00")
            sub = batch.slice(s, e - s)
            if self.write_outputs:
                d = os.path.join(self.data_dir, f"part_id={pid}", f"sink={sink}")
                os.makedirs(d, exist_ok=True)
                first = sub["doc_id"][0].as_py()
                last = sub["doc_id"][len(sub) - 1].as_py()
                name = hashlib.sha1(
                    f"{pid}|{sink}|{first}|{last}|{len(sub)}".encode()
                ).hexdigest()[:16]
                pq.write_table(
                    sub.drop_columns(["part_id", "sink"]),
                    os.path.join(d, f"{name}.parquet"),
                )
            # partial counts per source within this (pid, sink) slice
            agg = sub.group_by(["source"]).aggregate([([], "count_all"), ("n_tok", "sum")])
            out_parts += [pid] * len(agg)
            out_sinks += [sink] * len(agg)
            out_sources += agg["source"].to_pylist()
            out_n += agg["count_all"].to_pylist()
            out_toks += agg["n_tok_sum"].to_pylist()
        return pa.table(
            {
                "part_id": pa.array(out_parts, pa.string()),
                "sink": pa.array(out_sinks, pa.string()),
                "source": pa.array(out_sources, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "sum_n_tok": pa.array([int(x) for x in out_toks], pa.int64()),
            }
        )


def build_flagship_dataset(
    files: list[str],
    lookup_ref,
    *,
    error_tolerant: bool = True,
    enrich_mode: str = "tasks",
    enrich_concurrency=None,
    override_num_blocks: int | None = None,
) -> "rd.Dataset":
    """The lazy transform chain up to (and including) routing — WITHOUT the
    fused write; used by tests and ad-hoc consumers."""
    ds = _read_and_parse(
        files, lookup_ref,
        error_tolerant=error_tolerant,
        enrich_mode=enrich_mode,
        enrich_concurrency=enrich_concurrency,
        override_num_blocks=override_num_blocks,
    )
    rules = FLAGSHIP_RULES if error_tolerant else FLAGSHIP_RULES[1:]
    router = Router(rules=rules, default_sink="sink_standard", sink_field="sink")
    ds = ds.map_batches(router, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    if error_tolerant:
        ds = ds.drop_columns(["_ok"])
    return ds


def _read_and_parse(
    files: list[str],
    lookup_ref,
    *,
    error_tolerant: bool,
    enrich_mode: str,
    enrich_concurrency,
    override_num_blocks: int | None,
) -> "rd.Dataset":
    # read_parquet_bulk: one whole-file read task per shard, no per-fragment
    # metadata machinery (measured ~2× cheaper than read_parquet for this
    # many-files layout).  Input sharding (file count) is the parallelism
    # knob — exactly the Kafka-partition model.  ``override_num_blocks``
    # deliberately unused by default: block-splitting would only insert an
    # extra object-store hop between read and the fused map chain.
    from log_formatter_ray.sources import clean, read_parquet_clean

    if override_num_blocks:
        ds = read_parquet_clean(
            files, include_paths=True, override_num_blocks=override_num_blocks
        )
    else:
        ds = clean(rd.read_parquet_bulk(files, include_paths=True))
    ds = ds.map_batches(
        _basename_tagger(files), batch_format="pyarrow", batch_size=None
    )

    parser = GrokParser(
        components_regex=DOC_ID_PATTERN,
        target_field="doc_id",
        labels=DAY_LABELS,
        error_tolerant=error_tolerant,
        ok_field="_ok" if error_tolerant else None,
    )
    ds = ds.map_batches(parser, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    enricher_kwargs = {"key": "source"}
    if enrich_mode == "actors":
        # Actor pool for expensive-setup enrichers; size it so it cannot
        # become the chain's concurrency cap.
        ds = ds.map_batches(
            LookupEnricher,
            fn_constructor_args=(lookup_ref,),
            fn_constructor_kwargs=enricher_kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            concurrency=enrich_concurrency or (2, 16),
        )
    else:
        # Elastic stateless tasks: the broadcast table is ray.get()-ed
        # zero-copy from shared memory per worker; Ray fuses this into the
        # single read→parse→enrich→route+write task chain.
        ds = ds.map_batches(
            LookupEnricher(lookup_ref, **enricher_kwargs),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    return ds


# Above this many partial rows the per-wave reduce spills to a distributed
# Ray groupby instead of driver pandas (the dedup drop-set plan's guard
# pair — VERDICT r4).  Partials are ≤ |sinks×sources| rows per block, so
# 5M rows corresponds to ~10⁵–10⁶ blocks per wave.
PARTIAL_REDUCE_LIMIT = 5_000_000

# One footer read per file, fanned out as Ray tasks in groups (VERDICT r4
# item 3: the round-4 driver read 10⁶ footers SERIALLY per wave).  Footer
# reads are tiny; grouping amortizes task overhead.
_FOOTER_GROUP = 64


@ray.remote(num_cpus=0.25)
def _footer_rows(files: list[str]) -> dict[str, int]:
    import pyarrow.parquet as _pq

    return {f: _pq.read_metadata(f).num_rows for f in files}


def _process_wave(
    wave: dict[str, list[str]],
    out_dir: str,
    data_dir: str,
    lookup_ref,
    *,
    error_tolerant: bool,
    enrich_mode: str,
    enrich_concurrency,
    override_num_blocks,
    write_outputs: bool,
    rules: tuple | None = None,
) -> tuple[dict[str, PartitionManifest], str]:
    """Run one wave of pending partitions end-to-end and manifest them."""
    wave_files = sorted(f for fs in wave.values() for f in fs)
    ds = _read_and_parse(
        wave_files,
        lookup_ref,
        error_tolerant=error_tolerant,
        enrich_mode=enrich_mode,
        enrich_concurrency=enrich_concurrency,
        override_num_blocks=override_num_blocks,
    )
    if rules is None:
        rules = FLAGSHIP_RULES if error_tolerant else FLAGSHIP_RULES[1:]
    router = Router(rules=rules, default_sink="sink_standard", sink_field="sink")
    writer = RouteAndWrite(
        router, data_dir, drop_cols=("_ok",) if error_tolerant else (),
        write_outputs=write_outputs,
    )
    partials = ds.map_batches(
        writer, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    # Kick off the per-file footer-row tasks BEFORE consuming the wave so
    # they overlap the pipeline execution (they only block at the ray.get
    # below, after the wave has run).
    footer_refs = [
        _footer_rows.remote(wave_files[i : i + _FOOTER_GROUP])
        for i in range(0, len(wave_files), _FOOTER_GROUP)
    ]

    # Partials are ≤ |sinks×sources| rows per block — reduce them on the
    # driver while they fit (Ray's sort-based groupby costs ~50ms/block of
    # fixed overhead, which dwarfs the work for kilobyte partials), and
    # spill to ONE distributed groupby above PARTIAL_REDUCE_LIMIT rows so
    # a 10⁶-block wave never funnels raw partials through one process.
    partials = partials.materialize()
    if partials.count() > PARTIAL_REDUCE_LIMIT:
        from ray.data.aggregate import Sum

        agg = (
            partials.groupby(["part_id", "sink", "source"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_n_tok", alias_name="sum_n_tok"))
            .to_pandas()
        )
    else:
        agg = (
            partials.to_pandas()
            .groupby(["part_id", "sink", "source"], as_index=False)[
                ["n", "sum_n_tok"]
            ]
            .sum()
        )
    stats = partials.stats()

    rows_in_per_file: dict[str, int] = {}
    for d in ray.get(footer_refs):
        rows_in_per_file.update(d)
    by_pid = dict(tuple(agg.groupby("part_id")))
    done: dict[str, PartitionManifest] = {}
    for pid, fs in wave.items():
        sub = by_pid.get(pid, agg.iloc[0:0])
        sink_counts = sub.groupby("sink")["n"].sum().to_dict()
        ss_counts = {f"{r.sink}|{r.source}": int(r.n) for r in sub.itertuples()}
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
        if write_outputs:
            write_manifest(out_dir, m)
        done[pid] = m
    return done, stats


def run_flagship(
    input_path: str | list[str],
    out_dir: str,
    *,
    lookup: pa.Table | None = None,
    resume: bool = True,
    error_tolerant: bool = True,
    enrich_mode: str = "tasks",
    enrich_concurrency=None,
    override_num_blocks: int | None = None,
    write_outputs: bool = True,
    wave_size: int | None = None,
    reload_config=None,
) -> FlagshipResult:
    """Run (or resume) the flagship job.  Ray must already be initialised.

    ``wave_size``: process pending partitions in waves of this many,
    writing each wave's lineage manifests as soon as it completes — so a
    kill mid-job loses at most one wave of work instead of the whole run.
    Default (None) = one wave.  Each wave is a full streaming Ray Data job,
    so size waves in the hundreds-of-partitions range to amortize the ~1 s
    job startup (e.g. 256 partitions/wave at 10^6 partitions total).

    ``reload_config``: optional zero-arg callable invoked at every WAVE
    BOUNDARY (before each wave) — the batch analog of the reference's hot
    config reload (/root/reference/agent/manager.go:122-164, SIGHUP →
    rebuild pipeline between messages).  It may return a dict with keys
    ``rules`` (tuple of RouteRule, replaces the routing cascade for
    subsequent waves) and/or ``lookup`` (pa.Table, replaces the enrich
    dictionary); return None/{} to keep the current config.  Because it
    runs between waves, every individual partition is processed under
    exactly ONE config version, recorded in its manifest counts.
    """
    if isinstance(input_path, str):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = sorted(input_path)
    if not files:
        raise ValueError(f"no parquet inputs under {input_path!r}")

    parts = assign_partitions(files)
    done = load_manifests(out_dir) if resume else {}
    # Remove stale manifests (and their outputs) for partitions that no
    # longer correspond to current inputs — leaving the files would make
    # _metrics.json disagree with the run result.
    from log_formatter_ray.state.manifest import manifest_dir

    data_dir = os.path.join(out_dir, "data")
    for pid in list(done):
        if pid not in parts:
            del done[pid]
            stale = os.path.join(manifest_dir(out_dir), f"{pid}.json")
            if os.path.exists(stale):
                os.remove(stale)
            clean_partition_output(data_dir, pid)
    pending = {pid: fs for pid, fs in parts.items() if pid not in done}

    for pid in pending:
        clean_partition_output(data_dir, pid)

    stats = ""
    if pending:
        from log_formatter_ray.state.metrics import write_metrics

        lookup_ref = ray.put(lookup if lookup is not None else make_source_lookup())
        rules: tuple | None = None  # None = the built-in FLAGSHIP_RULES
        pids = sorted(pending)
        step = wave_size or len(pids)
        for i in range(0, len(pids), step):
            if reload_config is not None:
                cfg = reload_config() or {}
                if "rules" in cfg:
                    rules = tuple(cfg["rules"])
                if "lookup" in cfg:
                    lookup_ref = ray.put(cfg["lookup"])
            wave = {pid: pending[pid] for pid in pids[i : i + step]}
            wave_done, stats = _process_wave(
                wave, out_dir, data_dir, lookup_ref,
                error_tolerant=error_tolerant,
                enrich_mode=enrich_mode,
                enrich_concurrency=enrich_concurrency,
                override_num_blocks=override_num_blocks,
                write_outputs=write_outputs,
                rules=rules,
            )
            done.update(wave_done)
            if write_outputs:
                # heartbeat analog (manager.go:166-225): a fresh
                # _metrics.json after EVERY completed wave, not only at
                # job end — a mid-run kill leaves wave-accurate progress.
                write_metrics(out_dir)

    # Corpus-level result assembled from ALL manifests (incl. prior runs).
    agg_counts: dict[tuple[str, str], int] = {}
    rows_in = rows_routed = token_sum = 0
    for m in done.values():
        rows_in += m.rows_in
        rows_routed += m.rows_routed
        token_sum += m.token_sum
        for key, n in m.sink_source_counts.items():
            sink, source = key.split("|", 1)
            agg_counts[(sink, source)] = agg_counts.get((sink, source), 0) + n
    counts = pa.table(
        {
            "sink": pa.array([k[0] for k in sorted(agg_counts)], pa.string()),
            "source": pa.array([k[1] for k in sorted(agg_counts)], pa.string()),
            "n": pa.array([agg_counts[k] for k in sorted(agg_counts)], pa.int64()),
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


def ingest(input_path: str | list[str], out_dir: str, **kwargs) -> FlagshipResult:
    """Incremental-arrival ingestion — the bounded analog of the reference's
    continuous Kafka consumption.

    Call it again whenever new files have landed under ``input_path``: only
    files with no lineage manifest are processed; everything already
    manifested is skipped untouched.  The manifest plays the role of the
    committed consumer-group offset (at-least-once per file — the manifest
    is written only AFTER the partition's outputs are durable, exactly like
    kafka.go:182-186 commits offsets only after enqueue), and because a
    reprocessed partition first deletes its own output directory the
    end-to-end effect is effectively-once.

    Equivalent to ``run_flagship(..., resume=True)``; named separately so
    the ingestion mode is an explicit, documented capability.
    """
    kwargs.setdefault("resume", True)
    return run_flagship(input_path, out_dir, **kwargs)


def poll_ingest(
    input_path: str | list[str],
    out_dir: str,
    interval_s: float = 30.0,
    max_polls: int | None = None,
    stop: "object | None" = None,
    on_result=None,
    **kwargs,
) -> list[FlagshipResult]:
    """Periodic re-poll loop driving ``ingest`` — the analog of the
    reference's Elasticsearch input ``retry`` timer
    (/root/reference/agent/input/elasticsearch/elasticsearch.go:104-178:
    re-issue the query every ``retry`` seconds, emit only new hits).

    Each poll is one bounded ``ingest`` pass: files that gained a manifest
    in an earlier poll are skipped, so a poll costs only the NEW arrivals
    (plus one directory listing).  Stop with ``max_polls``, or pass a
    ``threading.Event`` as ``stop`` and set it from another thread (the
    drain path — the loop always finishes its current pass first, so no
    partition is half-committed).  ``on_result(result)`` is called after
    every poll for metrics/logging.  Returns the per-poll results.

    For an external scheduler instead of a resident loop, run
    ``ingest()`` from cron at the same cadence — the manifest store makes
    the two exactly equivalent.
    """
    import time as _time

    results: list[FlagshipResult] = []
    n = 0
    while True:
        res = ingest(input_path, out_dir, **kwargs)
        results.append(res)
        if on_result is not None:
            on_result(res)
        n += 1
        if max_polls is not None and n >= max_polls:
            break
        if stop is not None and stop.wait(interval_s):
            break
        if stop is None:
            _time.sleep(interval_s)
    return results
