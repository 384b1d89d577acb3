"""Field-projection filter (the reference's ``filter`` formatter).

Reference semantics (/root/reference/agent/pipeline/filter/filter.go:31-69):
keep only fields whose *name* matches any ``include_fields`` regex; setting
both ``include_fields`` and ``exclude_fields`` is a config error
(filter.go:13-19).  Reference quirk: ``exclude_fields`` is compiled but
``Format`` never applies it — an exclude-only config produces empty docs
(filter.go:51-54,61-67).  We implement exclude properly (documented
divergence; the quirk is preserved in a unit test as a known reference
behavior, not replicated).

Ray-Data-native form: with a fixed Arrow schema, name-matching happens ONCE
at plan time against the schema, then the stage is a zero-copy
``select_columns`` — no per-batch work at all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class FieldFilter:
    include_fields: tuple[str, ...] = ()
    exclude_fields: tuple[str, ...] = ()

    def __post_init__(self):
        if self.include_fields and self.exclude_fields:
            # filter.go:44-49 — config error to set both.
            raise ValueError("cannot set both include_fields and exclude_fields")
        if not self.include_fields and not self.exclude_fields:
            raise ValueError("one of include_fields / exclude_fields is required")

    def kept_columns(self, column_names: list[str]) -> list[str]:
        """Which schema columns survive (order-preserving)."""
        if self.include_fields:
            pats = [re.compile(p) for p in self.include_fields]
            return [c for c in column_names if any(p.search(c) for p in pats)]
        pats = [re.compile(p) for p in self.exclude_fields]
        return [c for c in column_names if not any(p.search(c) for p in pats)]

    def apply(self, ds):
        """Plan-time projection: ``ds.select_columns`` (zero-copy, and lets
        Ray Data push the projection toward the read)."""
        kept = self.kept_columns(ds.schema().names)
        return ds.select_columns(kept)


def make_filter(cfg: dict) -> FieldFilter:
    return FieldFilter(
        include_fields=tuple(cfg.get("include_fields", []) or []),
        exclude_fields=tuple(cfg.get("exclude_fields", []) or []),
    )
