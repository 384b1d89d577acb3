"""Per-partition lineage manifests — the checkpoint/resume contract.

The reference is deliberately stateless ("it won't store any information",
/root/reference/deployment/README.md:3); restart-resume exists only via
Kafka group offsets committed after enqueue (at-least-once,
/root/reference/agent/input/kafka/kafka.go:182-186).  For a bounded batch
job the equivalent — and stronger, effectively-once — contract is:

* the unit of work is a LOGICAL partition = one input file (stable across
  reruns and across parallelism levels; never a Ray block id),
* a partition's outputs land under its own hive directory
  ``data/part_id=<pid>/sink=<sink>/``,
* a JSON lineage manifest (input file, rows in/routed/dropped, per-sink
  counts, token checksum) is written ATOMICALLY (tmp + rename) only after
  the partition's data is durable,
* resume = skip manifested partitions, delete and reprocess the rest.

Kill the job at any point: partitions with manifests are never re-read or
re-written; partitions without are redone idempotently.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field


@dataclass
class PartitionManifest:
    part_id: str
    input_files: list[str]
    rows_in: int
    rows_routed: int
    rows_dropped: int
    sink_counts: dict[str, int] = field(default_factory=dict)
    # per-(sink, source) lineage counts, keyed "sink|source"
    sink_source_counts: dict[str, int] = field(default_factory=dict)
    token_sum: int = 0  # Σ n_tok over routed rows — cheap cardinality checksum
    token_bytes: int = 0  # token_sum × 4 (int32 payload bytes)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "PartitionManifest":
        return cls(**json.loads(s))


def part_id_for_file(path: str) -> str:
    """Deterministic partition id from the input file's basename — stable
    across reruns, file-list ordering, and parallelism levels."""
    h = hashlib.sha1(os.path.basename(path).encode()).hexdigest()[:10]
    return f"p{h}"


def assign_partitions(files: list[str]) -> dict[str, list[str]]:
    """partition id → input files (currently 1 file = 1 partition; basename
    hash collisions merge files into one partition, which stays correct)."""
    out: dict[str, list[str]] = {}
    for f in sorted(files):
        out.setdefault(part_id_for_file(f), []).append(f)
    return out


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def write_manifest(out_dir: str, m: PartitionManifest) -> str:
    """Atomic: write tmp in the same directory, then rename (POSIX atomic)."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{m.part_id}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        f.write(m.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)
    return final


def load_manifests(out_dir: str) -> dict[str, PartitionManifest]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            m = PartitionManifest.from_json(f.read())
        out[m.part_id] = m
    return out


def clean_partition_output(data_dir: str, part_id: str) -> None:
    """Remove a partition's (possibly partial) output before reprocessing —
    this is what makes retried/resumed writes idempotent."""
    d = os.path.join(data_dir, f"part_id={part_id}")
    if os.path.isdir(d):
        shutil.rmtree(d)
