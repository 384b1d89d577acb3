"""Source registry — the reference's input plugins, Ray-Data-native.

Reference: exactly one input per agent, registered by name and pumped into
the in-queue (/root/reference/agent/input/input.go:44-102); `.so` plugins
extend the registry (input.go:75-93).  Here a source is a factory
``cfg → ray.data.Dataset`` in a plain dict registry (the Python analog of
the plugin mechanism — no dynamic linking needed).
"""

from __future__ import annotations

from collections.abc import Callable

import ray.data as rd


def _parquet_source(cfg: dict):
    """Canonical bounded source (the Kafka-topic analog: file shards play the
    role of topic partitions, /root/reference/agent/input/kafka/kafka.go:90-126).

    ``columns`` prunes at the read; ``override_num_blocks`` ≈ ``worker: N``.
    """
    return rd.read_parquet(
        cfg["path"],
        columns=cfg.get("columns"),
        include_paths=bool(cfg.get("include_paths", False)),
        override_num_blocks=cfg.get("override_num_blocks"),
        concurrency=cfg.get("concurrency"),
    )


def _text_source(cfg: dict):
    """Line source (console/file input analog,
    /root/reference/agent/input/console/console.go:21-37): each line becomes
    ``{"message": line}`` — same doc shape as the reference."""
    ds = rd.read_text(cfg["path"])
    return ds.rename_columns({"text": "message"})


def _items_source(cfg: dict):
    """In-memory source for tests/config smoke (console-input analog)."""
    return rd.from_items(cfg["items"])


def _console_source(cfg: dict):
    """stdin line source — the reference's ``console`` input
    (/root/reference/agent/input/console/console.go:21-37) without the
    1 line/s throttle (a batch engine reads what is there)."""
    import sys

    stream = cfg.get("stream") or sys.stdin
    lines = [line.rstrip("\n") for line in stream]
    return rd.from_items([{"message": line} for line in lines])


def _json_source(cfg: dict):
    """JSON-lines source — the Kafka ``schema: json`` decode analog
    (/root/reference/agent/input/kafka/kafka.go:159-173): nested values
    become Arrow struct/list columns."""
    return rd.read_json(cfg["path"])


def _csv_source(cfg: dict):
    return rd.read_csv(cfg["path"])


SOURCES: dict[str, Callable[[dict], "rd.Dataset"]] = {
    "parquet": _parquet_source,
    "text": _text_source,
    "items": _items_source,
    "console": _console_source,
    "json": _json_source,
    "csv": _csv_source,
}


def register_source(name: str, factory: Callable[[dict], "rd.Dataset"]) -> None:
    """The `.so`-plugin analog: extend the registry at import time."""
    SOURCES[name] = factory


def build_source(cfg: dict):
    """``cfg`` = ``{<source_name>: {...}}`` (reference config shape:
    ``input.target`` selects the plugin, agent/input/input.go:50-64)."""
    (name, sub), = cfg.items()
    if name not in SOURCES:
        raise ValueError(f"unknown source {name!r}; registered: {sorted(SOURCES)}")
    return SOURCES[name](sub or {})
