"""Pipeline stages (the reference's "formatters" re-expressed for batches).

Reference interface: ``Format(doc) (doc, error)`` applied doc-at-a-time by a
worker chain (/root/reference/agent/pipeline/protocol/protocol.go:3-5,
pipeline.go:153-187).  Here every stage is a vectorized transform over a
``pyarrow.Table`` batch, applied with ``Dataset.map_batches`` — stateless
stages as plain callables (Ray tasks), stateful ones (broadcast lookups) as
callable classes (Ray actor pools).
"""

from log_formatter_ray.stages.parse import GrokParser
from log_formatter_ray.stages.filter import FieldFilter
from log_formatter_ray.stages.forwarder import forwarder
from log_formatter_ray.stages.enrich import LookupEnricher
from log_formatter_ray.stages.route import Router, render_template
from log_formatter_ray.stages.aggregate import grouped_count

__all__ = [
    "GrokParser",
    "FieldFilter",
    "forwarder",
    "LookupEnricher",
    "Router",
    "render_template",
    "grouped_count",
]
