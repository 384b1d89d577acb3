"""Routing stage — compute a ``sink`` column, then fan out in ONE pass.

The reference's fan-out is the ES output's dynamic index: an ``index``
config containing ``{{field}}`` is rendered per doc from the doc's field
values, so one logical output writes to many physical sinks
(/root/reference/util/config.go:16-32;
/root/reference/agent/output/elasticsearch/elasticsearch.go:81,109-113).

Ray-Data-native form: routing is DATA, not topology — a vectorized
first-match-wins rule cascade computes ``sink`` per row inside
``map_batches``, and the single ``write_parquet(partition_cols=["sink"])``
at the end is the whole fan-out.  No per-sink datasets, no N scans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

_TEMPLATE_FIELD = re.compile(r"\{\{(\w+)\}\}")


def render_template(
    batch: pa.Table, template: str, first_field_all: bool = False
) -> pa.Array:
    """Vectorized ``{{field}}`` rendering (util/config.go:16-32): every
    ``{{name}}`` occurrence is replaced by that row's ``name`` value.

    Reference quirk (documented divergence): ``DynamicFromField`` extracts
    only the FIRST ``{{field}}`` and then ``ReplaceAllString``s every
    ``{{...}}`` slot with that first field's value (util/config.go:20-27) —
    multi-field templates silently reuse field one.  We render each slot
    from its own field by default; ``first_field_all=True`` replicates the
    reference behavior bit-for-bit for parity testing.
    """
    parts = _TEMPLATE_FIELD.split(template)  # [lit, fld, lit, fld, ..., lit]
    n = len(batch)
    if len(parts) == 1:  # constant sink (no template)
        return pa.array([template] * n, pa.string())
    first_field = parts[1]
    pieces = []
    for i, part in enumerate(parts):
        if i % 2 == 0:
            pieces.append(pa.array([part] * n, pa.string()))
        else:
            name = first_field if first_field_all else part
            col = pc.cast(batch[name], pa.string())
            pieces.append(pc.fill_null(col, "null").combine_chunks())
    return pc.binary_join_element_wise(*pieces, "")


_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    ">=": pc.greater_equal,
    ">": pc.greater,
    "<=": pc.less_equal,
    "<": pc.less,
}


@dataclass(frozen=True)
class Condition:
    """One predicate over a column; vectorized with pyarrow.compute."""

    field: str
    op: str  # ==, !=, >, >=, <, <=, in, not_in, is_null, not_null, match
    value: object = None

    def mask(self, batch: pa.Table) -> pa.ChunkedArray:
        col = batch[self.field]
        if self.op in _OPS:
            m = _OPS[self.op](col, self.value)
        elif self.op == "in":
            m = pc.is_in(col, value_set=pa.array(list(self.value)))
        elif self.op == "not_in":
            m = pc.invert(pc.is_in(col, value_set=pa.array(list(self.value))))
        elif self.op == "is_null":
            return pc.is_null(col)
        elif self.op == "not_null":
            return pc.is_valid(col)
        elif self.op == "match":
            m = pc.match_substring_regex(col, self.value)
        else:
            raise ValueError(f"unknown op {self.op!r}")
        # null comparison results mean "condition not met", like the
        # reference's missing-field template fallback.
        return pc.fill_null(m, False)


@dataclass(frozen=True)
class RouteRule:
    """``when`` conditions (ANDed) → ``sink`` (may contain ``{{field}}``)."""

    sink: str
    when: tuple[Condition, ...] = ()

    def mask(self, batch: pa.Table):
        m = None
        for cond in self.when:
            cm = cond.mask(batch)
            m = cm if m is None else pc.and_(m, cm)
        if m is None:
            m = pa.array([True] * len(batch))
        return m


@dataclass(frozen=True)
class Router:
    """First-match-wins rule cascade appending ``sink_field``.

    Applied back-to-front with ``pc.if_else`` so earlier rules overwrite
    later ones — exactly first-match-wins, in O(rules) vectorized passes.
    """

    rules: tuple[RouteRule, ...]
    default_sink: str = "sink_default"
    sink_field: str = "sink"

    def __call__(self, batch: pa.Table) -> pa.Table:
        sink = render_template(batch, self.default_sink)
        if isinstance(sink, pa.ChunkedArray):
            sink = sink.combine_chunks()
        for rule in reversed(self.rules):
            rendered = render_template(batch, rule.sink)
            mask = rule.mask(batch)
            sink = pc.if_else(mask, rendered, sink)
        if isinstance(sink, pa.ChunkedArray):
            sink = sink.combine_chunks()
        if self.sink_field in batch.column_names:
            return batch.set_column(
                batch.column_names.index(self.sink_field), self.sink_field, sink
            )
        return batch.append_column(self.sink_field, sink)


def make_router(cfg: dict) -> Router:
    """Build from config: ``{rules: [{sink, when: [{field, op, value}]}],
    default: ..., sink_field: ...}``."""
    rules = tuple(
        RouteRule(
            sink=r["sink"],
            when=tuple(
                Condition(field=c["field"], op=c["op"], value=c.get("value"))
                for c in r.get("when", [])
            ),
        )
        for r in cfg.get("rules", [])
    )
    return Router(
        rules=rules,
        default_sink=cfg.get("default", "sink_default"),
        sink_field=cfg.get("sink_field", "sink"),
    )
