"""Sink registry — the reference's output plugins, Ray-Data-native.

Reference: one output per agent (/root/reference/agent/output/output.go:44-101);
fan-out happens only via the ES output's dynamic ``{{field}}`` index
(elasticsearch.go:81,109-113).  Here the canonical sink is a partitioned
Parquet write — the ``partition_cols=["sink"]`` directory layout IS the
dynamic-index fan-out, done in one pass.
"""

from __future__ import annotations

from collections.abc import Callable


def _parquet_sink(ds, cfg: dict):
    """Durable acknowledged write (kafka-output analog: acks=all ≈ task
    completion + file durability, /root/reference/agent/output/kafka/kafka.go:72-75).

    ``partition_cols`` implements the ES dynamic-index fan-out;
    ``min_rows_per_file`` plays the bulk-batch role
    (elasticsearch.go:103,128-130: max(100, batchsize) docs per bulk).
    """
    ds.write_parquet(
        cfg["path"],
        partition_cols=cfg.get("partition_cols"),
        min_rows_per_file=cfg.get("min_rows_per_file"),
        concurrency=cfg.get("concurrency"),
    )
    return cfg["path"]


def _console_sink(ds, cfg: dict):
    """Debug sink (/root/reference/agent/output/console/console.go:16-27)."""
    ds.show(limit=int(cfg.get("limit", 20)))
    return None


def _csv_sink(ds, cfg: dict):
    """Plain-file output — the reference ships a file output plugin
    (config.modules/output-file-test.yml, Makefile file-file test); the
    Ray-native form is a sharded CSV write (one file per block, same
    streaming/backpressure path as parquet).  Not for token payloads —
    list columns don't fit CSV; project them away first."""
    ds.write_csv(
        cfg["path"],
        min_rows_per_file=cfg.get("min_rows_per_file"),
        concurrency=cfg.get("concurrency"),
    )
    return cfg["path"]


def _elasticsearch_sink(ds, cfg: dict):
    """HTTP ``_bulk`` client sink (elasticsearch.go:39-166): NDJSON bulk
    batches of max(100, batchsize) docs, ``{{field}}`` dynamic index,
    POSTs running inside Ray workers.  See ``sinks.elasticsearch``."""
    from log_formatter_ray.sinks.elasticsearch import elasticsearch_sink

    return elasticsearch_sink(ds, cfg)


SINKS: dict[str, Callable] = {
    "parquet": _parquet_sink,
    "console": _console_sink,
    "csv": _csv_sink,
    "file": _csv_sink,  # reference naming alias (output-file-test.yml)
    "elasticsearch": _elasticsearch_sink,
}


def register_sink(name: str, write_fn: Callable) -> None:
    SINKS[name] = write_fn


def write_sink(ds, cfg: dict):
    (name, sub), = cfg.items()
    if name not in SINKS:
        raise ValueError(f"unknown sink {name!r}; registered: {sorted(SINKS)}")
    return SINKS[name](ds, sub or {})
