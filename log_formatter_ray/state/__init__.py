"""Run state: per-partition lineage manifests for checkpoint/resume."""

from log_formatter_ray.state.manifest import (
    PartitionManifest,
    assign_partitions,
    load_manifests,
    write_manifest,
)

__all__ = ["PartitionManifest", "assign_partitions", "load_manifests", "write_manifest"]
