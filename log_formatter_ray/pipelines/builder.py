"""PlanBuilder: config dict → executable Ray Data plan.

The Ray-Data-native analog of the reference's AgentsManager wiring
(/root/reference/agent/manager.go:38-79): one input, a config-ordered
formatter chain, optional static labels, optional routing, one output —
except each piece becomes a Dataset transform instead of a goroutine.

Formatter registry mirrors the reference's name→factory registry
(/root/reference/agent/pipeline/formatter.go:16-36); ``register_formatter``
is the `.so`-plugin analog (formatter.go:38-73).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow.parquet as pq

import ray

from log_formatter_ray.sinks import write_sink
from log_formatter_ray.sources import build_source
from log_formatter_ray.stages.enrich import LookupEnricher, StaticLabels
from log_formatter_ray.stages.filter import make_filter
from log_formatter_ray.stages.forwarder import forwarder
from log_formatter_ray.stages.parse import make_parser
from log_formatter_ray.stages.route import make_router


def _build_parser_stage(cfg: dict):
    parser = make_parser(cfg)

    def apply(ds):
        return ds.map_batches(
            parser, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    return apply


def _build_filter_stage(cfg: dict):
    f = make_filter(cfg)
    return f.apply  # plan-time projection


def _build_forwarder_stage(cfg: dict):
    def apply(ds):
        return ds.map_batches(
            forwarder, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    return apply


def _build_enrich_stage(cfg: dict):
    """Broadcast lookup enrich; the small side comes from ``lookup_path``
    (parquet) or inline ``lookup`` rows."""
    if "lookup_path" in cfg:
        table = pq.read_table(cfg["lookup_path"])
    else:
        import pyarrow as pa

        table = pa.table(cfg["lookup"])
    ref = ray.put(table)
    enricher = LookupEnricher(ref, key=cfg["key"], value_cols=cfg.get("columns"))
    concurrency = cfg.get("concurrency")

    def apply(ds):
        if concurrency:  # actor pool (expensive-setup form)
            return ds.map_batches(
                LookupEnricher,
                fn_constructor_args=(ref,),
                fn_constructor_kwargs={
                    "key": cfg["key"],
                    "value_cols": cfg.get("columns"),
                },
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
                concurrency=concurrency,
            )
        return ds.map_batches(
            enricher, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    return apply


FORMATTERS: dict[str, Callable[[dict], Callable]] = {
    "parser": _build_parser_stage,
    "filter": _build_filter_stage,
    "forwarder": _build_forwarder_stage,
    "enrich": _build_enrich_stage,
}


def register_formatter(name: str, factory: Callable[[dict], Callable]) -> None:
    """The `.so`-plugin analog: add a formatter stage factory by name."""
    FORMATTERS[name] = factory


class PlanBuilder:
    """Assemble (and optionally run) the Dataset plan for a config."""

    def __init__(self, cfg: dict):
        from log_formatter_ray.config import validate_config

        validate_config(cfg)
        self.cfg = cfg

    def build(self):
        """→ lazy Dataset: input → formatter chain → labels → route."""
        return self.apply_stages(build_source(self.cfg["input"]))

    def apply_stages(self, ds):
        """The formatter chain → labels → route, over ANY input Dataset —
        shared by the batch plan and the streaming per-delta handler."""
        pipe = self.cfg.get("pipeline") or {}
        for entry in pipe.get("formatters", []):
            (name, sub), = entry.items()
            if name not in FORMATTERS:
                raise ValueError(
                    f"unknown formatter {name!r}; registered: {sorted(FORMATTERS)}"
                )
            ds = FORMATTERS[name](sub or {})(ds)

        labels = pipe.get("labels")
        if labels:  # static label merge (pipeline.go:169-171)
            ds = ds.map_batches(
                StaticLabels(labels),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )

        route = self.cfg.get("route")
        if route:
            ds = ds.map_batches(
                make_router(route),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        return ds

    def run(self):
        """Build and write to the configured output; returns the sink result."""
        return write_sink(self.build(), self.cfg["output"])

    def run_streaming(self, offset_path: str, **loop_kwargs):
        """Continuous mode — the reference agent's unbounded run
        (/root/reference/agent/input/input.go:95-102) over the SAME config
        surface: ``input`` names a registered stream connector
        (``sources/streaming.py``), every polled delta runs the identical
        formatter chain, and each delta's output lands under the
        configured path in its own ``delta=<k>/`` directory (idempotent:
        a replayed delta — crash between write and offset commit —
        overwrites its own directory, never duplicates into another).
        ``loop_kwargs`` forward to :func:`run_stream` (``interval_s``,
        ``max_polls``, ``stop``, ``empty_polls_to_drain``)."""
        import copy
        import hashlib
        import json as _json
        import os as _os

        from log_formatter_ray.sources.streaming import (
            build_connector,
            run_stream,
        )

        conn = build_connector(self.cfg["input"])
        out_cfg = self.cfg["output"]
        (sink_name, sink_sub), = out_cfg.items()
        state = {"offset": None}

        def handler(delta):
            ds = self.apply_stages(delta)
            cfg = copy.deepcopy(out_cfg)
            if isinstance(sink_sub, dict) and "path" in sink_sub:
                # delta directory keyed by the PRE-POLL offset: a replay
                # of the same delta rewrites the same directory
                key = hashlib.sha1(
                    _json.dumps(state["offset"], sort_keys=True).encode()
                ).hexdigest()[:12]
                d = _os.path.join(sink_sub["path"], f"delta={key}")
                import shutil as _shutil

                _shutil.rmtree(d, ignore_errors=True)
                cfg[sink_name]["path"] = d
            return write_sink(ds, cfg)

        class _TrackingConnector:
            """Expose the pre-poll offset to the handler for delta keys."""

            def poll(self, offset):
                state["offset"] = offset
                return conn.poll(offset)

        return run_stream(
            _TrackingConnector(), handler, offset_path, **loop_kwargs
        )


def run_config_file(path: str):
    from log_formatter_ray.config import load_config_file

    return PlanBuilder(load_config_file(path)).run()
