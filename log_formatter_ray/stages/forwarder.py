"""Identity pass-through (the reference's ``forwarder`` formatter,
/root/reference/agent/pipeline/forwarder/forwarder.go:14-21).

In a Dataset plan the right implementation is *no stage at all*; the
callable exists for pipeline-shape parity tests and config-driven chains.
"""

from __future__ import annotations

import pyarrow as pa


def forwarder(batch: pa.Table) -> pa.Table:
    return batch


def make_forwarder(cfg: dict):
    return forwarder
