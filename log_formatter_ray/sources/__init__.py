"""Source registry — the reference's input plugins, Ray-Data-native.

Reference: exactly one input per agent, registered by name and pumped into
the in-queue (/root/reference/agent/input/input.go:44-102); `.so` plugins
extend the registry (input.go:75-93).  Here a source is a factory
``cfg → ray.data.Dataset`` in a plain dict registry (the Python analog of
the plugin mechanism — no dynamic linking needed).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import ray.data as rd


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def clean(ds: "rd.Dataset") -> "rd.Dataset":
    """Strip schema-level metadata right after a read (zero-copy, fuses
    into the read op).  Parquet written via pandas carries a ``b'pandas'``
    schema-metadata blob that makes ``pa.Schema`` UNHASHABLE — every block
    then defeats Ray's schema-dedup fast path and logs ``Failed to hash
    the schemas (for deduplication)`` per task (VERDICT r3 item 8)."""
    return ds.map_batches(
        _strip_schema_metadata,
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )


def read_parquet_clean(paths, columns=None, **kwargs) -> "rd.Dataset":
    """``read_parquet`` that yields HASHABLE block schemas even for files
    written via pandas (whose ``b'pandas'`` footer metadata makes
    ``pa.Schema`` unhashable, defeating Ray's schema dedup with a
    ``Failed to hash the schemas`` warning per unify).

    Strategy, chosen per input (footer-only probe, no data read):

    * clean footer → plain ``read_parquet`` (nothing to strip);
    * dirty footer → explicit clean column-projected ``schema=`` — both the
      datasource's inferred schema AND every block come out metadata-free;
    * dirty footer + ``include_paths`` (declared schema would diverge from
      the injected ``path`` column) → ``_block_udf`` strip inside the read
      tasks (pinned-version ray 2.49.2 passthrough).  NOTE ``_block_udf``
      is never combined with a clean footer: Ray's schema inference calls
      ``with_metadata(None)`` around it, which attaches an EMPTY dict —
      itself unhashable.

    For a LIST of paths the first file's footer proves nothing about the
    rest (ADVICE r4: a clean file[0] masked dirty later files, silently
    resurrecting the warning) — so list inputs always get the explicit
    stripped ``schema=`` from file[0] (harmless when already clean:
    measured zero read-path cost, BASELINE.md r4), except under
    ``include_paths`` where a declared schema would diverge from the
    injected ``path`` column: there every footer is probed, short-
    circuiting at the first dirty one.
    """
    import pyarrow.parquet as pq

    dirty = False
    if "schema" not in kwargs:
        is_list = not isinstance(paths, str)
        plist = list(paths) if is_list else [paths]
        try:
            if kwargs.get("include_paths"):
                for p in plist:  # short-circuits at the first dirty footer
                    if pq.read_schema(p).metadata:
                        dirty = True
                        break
            else:
                s = pq.read_schema(plist[0])
                if is_list or s.metadata:
                    s = s.remove_metadata()
                    kwargs["schema"] = (
                        pa.schema([s.field(c) for c in columns])
                        if columns else s
                    )
        except Exception:
            dirty = False  # directory / remote: our own writes, clean
    if dirty:
        kwargs["_block_udf"] = _strip_schema_metadata
    return rd.read_parquet(paths, columns=columns, **kwargs)


def _parquet_source(cfg: dict):
    """Canonical bounded source (the Kafka-topic analog: file shards play the
    role of topic partitions, /root/reference/agent/input/kafka/kafka.go:90-126).

    ``columns`` prunes at the read; ``override_num_blocks`` ≈ ``worker: N``.
    """
    return read_parquet_clean(
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
