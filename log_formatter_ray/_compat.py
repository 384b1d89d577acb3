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

import logging

logger = logging.getLogger(__name__)

# The shim touches a PRIVATE Ray module (ray.data._internal.pandas_block),
# verified against these versions; on any other Ray, a failed import
# degrades to a logged no-op — the engine stays correct, only the
# schema-dedup log noise returns (VERDICT r4 item 8).
_VERIFIED_RAY = ("2.49.2",)

_patched = False


def install() -> None:
    """Idempotently wrap ``PandasBlockAccessor.to_arrow`` to drop schema
    metadata from converted blocks.  Best-effort: private-API import
    failure (or an unexpected accessor shape) logs one warning and
    no-ops — never blocks engine import on a Ray upgrade."""
    global _patched
    if _patched:
        return
    try:
        import ray

        if ray.__version__ not in _VERIFIED_RAY:
            logger.warning(
                "_compat: ray %s is not in the verified set %s; applying "
                "the pandas-block schema-metadata shim best-effort",
                ray.__version__, _VERIFIED_RAY,
            )
        from ray.data._internal.pandas_block import PandasBlockAccessor
    except (ImportError, AttributeError) as e:
        logger.warning(
            "_compat: pandas-block shim unavailable on this Ray (%s); "
            "schema-dedup warnings may reappear for pandas-format stages", e,
        )
        _patched = True  # don't retry per call
        return

    orig = PandasBlockAccessor.to_arrow

    def to_arrow(self):
        t = orig(self)
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        return t

    to_arrow.__wrapped__ = orig
    PandasBlockAccessor.to_arrow = to_arrow
    _patched = True
