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
        ds = build_source(self.cfg["input"])

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


def run_config_file(path: str):
    from log_formatter_ray.config import load_config_file

    return PlanBuilder(load_config_file(path)).run()
