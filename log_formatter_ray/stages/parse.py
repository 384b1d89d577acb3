"""Grok-style regex parse stage — the reference's flagship formatter.

Reference semantics (/root/reference/agent/pipeline/parser/parser.go:62-107):

* ``doc[target_field]`` (string) is matched against ``components_regex``; each
  named group becomes a new doc field (parser.go:99-104).
* Group names ending in ``_`` are extracted — and usable as label
  components — but discarded from the output doc (parser.go:90-92,100-102).
* Per-component label extraction: for each ``labels[i] = {component,
  regexprs[]}``, every regex runs over that component's value and merges its
  named groups into the doc, with the same ``_``-discard rule
  (parser.go:79-97).  A label regex that fails to match is SOFT — the
  reference logs a warning and ``continue``s (parser.go:86-89); the doc is
  never dropped for a label miss, and groups from the regexes that did
  match are kept.  Within one name, the LAST matching regex wins (each
  labelMap is merged into the doc in order).
* Merge precedence: label maps are merged DURING the labels loop, the
  component map is merged AFTER it (parser.go:92-104) — so on a name
  collision the component group overwrites the label group.
* ``error_tolerant=False`` (default): a missing target field or a
  ``components_regex`` mismatch is an error ⇒ the doc is dropped by the
  pipeline worker (parser.go:63-77; pipeline.go:158-167).
  ``error_tolerant=True``: the doc passes through unenriched (fixed-schema
  mapping: the extracted columns exist but are null for failed rows).

Ray-Data-native form: one vectorized ``pc.extract_regex`` per pattern per
batch (RE2, same engine as Go ``regexp``), a boolean ok-mask instead of
per-doc errors, and either ``Table.filter(ok)`` (drop mode) or null-masked
new columns (tolerant mode).  Original columns — in particular the
``tokens: list<int32>`` payload — are never copied: new columns are appended
to the zero-copy batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from log_formatter_ray.functions.regex import extract_named, is_discard_group, named_groups


@dataclass(frozen=True)
class LabelSpec:
    """One entry of the parser's ``labels`` config (parser.go:18-28)."""

    component: str
    regexprs: tuple[str, ...]

    @classmethod
    def from_config(cls, cfg: dict) -> "LabelSpec":
        return cls(component=cfg["component"], regexprs=tuple(cfg["regexprs"]))


@dataclass(frozen=True)
class GrokParser:
    """Vectorized parser stage; use as ``ds.map_batches(parser, batch_format="pyarrow")``.

    Extensions over the reference (documented, opt-in):

    * ``casts``: post-extract casts (e.g. ``{"seq": pa.int64()}``) — the
      reference keeps everything as strings.
    * ``ok_field``: name of an appended boolean column recording per-row parse
      success (only meaningful with ``error_tolerant=True``); lets the router
      send failed rows to a quarantine sink instead of silently passing them.
    """

    components_regex: str
    target_field: str
    labels: tuple[LabelSpec, ...] = ()
    error_tolerant: bool = False
    casts: dict = field(default_factory=dict)
    ok_field: str | None = None

    def __post_init__(self):
        comp_groups = set(named_groups(self.components_regex))
        if not comp_groups:
            raise ValueError("components_regex has no named groups")
        for lab in self.labels:
            if lab.component not in comp_groups:
                raise ValueError(
                    f"label component {lab.component!r} is not a group of components_regex"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.target_field not in batch.column_names:
            # Missing target field: the reference errors per-doc (parser.go:63-69);
            # with a fixed schema it is all-or-nothing per batch.
            if self.error_tolerant:
                return self._finalize(batch, {}, pa.array([False] * len(batch)))
            return batch.slice(0, 0)

        target = batch[self.target_field]
        comp_fields, ok = extract_named(target, self.components_regex)

        # Label extraction runs over component *values* (incl. `_`-suffixed
        # components).  Soft semantics (parser.go:86-89): a label regex that
        # does not match a row leaves that row's label fields untouched
        # (null if nothing else set them) and never affects ``ok``; within a
        # name, the last matching regex wins.
        label_fields: dict = {}
        for lab in self.labels:
            comp_values = comp_fields[lab.component]
            for pattern in lab.regexprs:
                sub_fields, sub_ok = extract_named(comp_values, pattern)
                valid = pc.and_(sub_ok, ok)
                for name, vals in sub_fields.items():
                    if is_discard_group(name):
                        continue  # `_` keys skipped at label merge (parser.go:90-92)
                    prev = label_fields.get(name)
                    fallback = (
                        prev if prev is not None else pa.scalar(None, vals.type)
                    )
                    label_fields[name] = pc.if_else(valid, vals, fallback)

        # Merge order (parser.go:92-104): labels first, components after —
        # component groups overwrite label groups on collision.
        fields = dict(label_fields)
        for name, vals in comp_fields.items():
            if not is_discard_group(name):
                fields[name] = vals

        return self._finalize(batch, fields, ok)

    def _finalize(self, batch: pa.Table, fields: dict, ok: pa.Array) -> pa.Table:
        out_fields = dict(fields)

        if self.error_tolerant:
            # pass-through-unenriched: failed rows keep original columns —
            # including when a group name collides with an EXISTING column
            # (the reference returns the doc untouched on failure,
            # parser.go:63-77, so the old value must survive); brand-new
            # columns are null for failed rows.
            for name, values in out_fields.items():
                if (
                    name in batch.column_names
                    and batch[name].type == values.type
                ):
                    fallback = batch[name].combine_chunks()
                    values = pc.if_else(ok, values, fallback)
                else:
                    values = pc.if_else(ok, values, pa.scalar(None, values.type))
                batch = self._set_column(batch, name, values)
            batch = self._apply_casts(batch, out_fields)
            if self.ok_field:
                batch = self._set_column(batch, self.ok_field, ok)
            return batch

        # drop mode: append then filter (reference drop semantics,
        # pipeline.go:158-167). Appending before the filter keeps a single
        # zero-copy take() over all columns.
        for name, values in out_fields.items():
            batch = self._set_column(batch, name, values)
        batch = self._apply_casts(batch, out_fields)
        if self.ok_field:
            batch = self._set_column(batch, self.ok_field, ok)
        return batch.filter(ok)

    def _apply_casts(self, batch: pa.Table, out_fields: dict) -> pa.Table:
        for name, typ in self.casts.items():
            if name in out_fields and name in batch.column_names:
                i = batch.column_names.index(name)
                batch = batch.set_column(i, name, pc.cast(batch[i], typ))
        return batch

    @staticmethod
    def _set_column(batch: pa.Table, name: str, values) -> pa.Table:
        """doc[name] = value — overwrite-or-append, like the reference's map set."""
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if name in batch.column_names:
            return batch.set_column(batch.column_names.index(name), name, values)
        return batch.append_column(name, values)


def make_parser(cfg: dict) -> GrokParser:
    """Build from the reference's YAML config shape (parser.go:18-28)."""
    import pyarrow as pa  # noqa: F811 — type names resolved from strings

    casts = {k: pa.type_for_alias(v) for k, v in (cfg.get("casts") or {}).items()}
    return GrokParser(
        components_regex=cfg["components_regex"],
        target_field=cfg["target_field"],
        labels=tuple(LabelSpec.from_config(c) for c in cfg.get("labels", [])),
        error_tolerant=bool(cfg.get("error_tolerant", False)),
        casts=casts,
        ok_field=cfg.get("ok_field"),
    )
