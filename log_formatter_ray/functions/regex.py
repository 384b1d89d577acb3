"""Vectorized named-group regex extraction (the reference's core kernel).

The reference extracts named groups one doc at a time with Go ``regexp``
(which is RE2): /root/reference/util/regexp.go:8-22, applied by the parser
/root/reference/agent/pipeline/parser/parser.go:62-107.  Arrow's
``pc.extract_regex`` is also RE2, so ``(?P<name>...)`` patterns and match
semantics carry over verbatim — but run once per *batch*, zero-copy.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# RE2 and Python `re` share the (?P<name>...) syntax.
_NAMED_GROUP = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")


def named_groups(pattern: str) -> list[str]:
    """Named capture groups of ``pattern``, in order of appearance."""
    return _NAMED_GROUP.findall(pattern)


def is_discard_group(name: str) -> bool:
    """The reference's convention: a group name ending in ``_`` is extracted
    (usable as a label component) but discarded from the output doc
    (/root/reference/agent/pipeline/parser/parser.go:90-92,100-102)."""
    return name.endswith("_")


def extract_named(
    arr: pa.ChunkedArray | pa.Array, pattern: str
) -> tuple[dict[str, pa.Array], pa.Array]:
    """Run ``pattern`` over a string column; return ({group → values}, ok_mask).

    Non-matching / null inputs yield ``ok_mask == False`` and empty-string
    group values (callers null them out or drop the rows — the two
    ``error_tolerant`` modes of the reference parser).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    struct = pc.extract_regex(arr, pattern)
    ok = pc.is_valid(struct)
    fields = {f.name: pc.struct_field(struct, f.name) for f in struct.type}
    return fields, ok
