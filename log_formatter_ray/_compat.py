"""Pinned-version compatibility shims for Ray Data (ray 2.49.2).

``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema-metadata blob to
every converted table, and a ``pa.Schema`` WITH metadata is unhashable
(``hash(schema)`` raises ``unhashable type: 'dict'``).  Ray Data's
``unify_schemas`` fast path tries ``set(schemas)`` first, so every block
that ever passed through a pandas-format stage defeats schema
deduplication and logs ``Failed to hash the schemas (for deduplication)``
once per task — at bench scale, hundreds of log lines per run and a
slower unify on every stats merge.

The schema metadata carries nothing we use (the engine's contract is
plain Arrow columns; the ``tokens`` payload never round-trips through
pandas at all — a repo-wide hard rule), so the single central fix is to
strip it at the one pandas→Arrow conversion point,
``PandasBlockAccessor.to_arrow``.  Reads of external parquet written by
pandas get the same treatment via ``sources.clean``.
"""

from __future__ import annotations

_patched = False


def install() -> None:
    """Idempotently wrap ``PandasBlockAccessor.to_arrow`` to drop schema
    metadata from converted blocks."""
    global _patched
    if _patched:
        return
    from ray.data._internal.pandas_block import PandasBlockAccessor

    orig = PandasBlockAccessor.to_arrow

    def to_arrow(self):
        t = orig(self)
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        return t

    to_arrow.__wrapped__ = orig
    PandasBlockAccessor.to_arrow = to_arrow
    _patched = True
