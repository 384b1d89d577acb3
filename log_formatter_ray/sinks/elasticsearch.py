"""Elasticsearch bulk-index sink — the reference's ES output client
(/root/reference/agent/output/elasticsearch/elasticsearch.go:39-166),
Ray-Data-native: the bulk POSTs run inside ``map_batches`` workers, so
indexing parallelizes across blocks instead of one goroutine draining a
channel.

Reference semantics mirrored:

* NDJSON ``_bulk`` bodies of ``max(100, batchsize)`` docs per request
  (elasticsearch.go:103,128-130) — action line ``{"create": {"_index":
  <rendered>}}`` + doc line per row (elasticsearch.go:106-124);
* dynamic ``{{field}}`` index routing per doc (elasticsearch.go:81 via
  util/config.go:16-32) — rendered vectorized by
  ``stages.route.render_template``;
* ``refresh`` on the bulk request (elasticsearch.go:133-136).

The 5-second flush timer has no analog: a batch engine's blocks are
already bounded, so every block flushes immediately.

The HTTP client is injected as ``transport_factory`` — a picklable
zero-arg callable returning an object with ``bulk(body: bytes) -> dict``.
The default posts to ``<host>/_bulk`` with stdlib ``urllib`` (no extra
dependency; this sandbox has no network or broker, so tests inject a
capture transport — the protocol IS the sink surface).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa


class UrllibTransport:
    """Minimal ``_bulk`` HTTP transport over stdlib urllib (picklable)."""

    def __init__(self, host: str, refresh: bool = True, timeout_s: float = 30.0):
        self.url = host.rstrip("/") + "/_bulk" + (
            "?refresh=true" if refresh else ""
        )
        self.timeout_s = timeout_s

    def bulk(self, body: bytes) -> dict:  # pragma: no cover - needs a server
        import json
        import urllib.request

        req = urllib.request.Request(
            self.url, data=body,
            headers={"Content-Type": "application/x-ndjson"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.load(resp)


class ESBulkWriter:
    """``map_batches`` callable: render the index per row, serialize
    NDJSON bulk bodies, POST chunks of ``max(100, batchsize)`` docs, and
    return one tiny ack-partial row per request (n_docs, errors) — the
    flagship sink's partials-not-rows output shape."""

    def __init__(
        self,
        index: str,
        transport_factory: Callable[[], object],
        batchsize: int = 100,
        first_field_all: bool = False,
    ):
        self.index = index
        self.chunk = max(100, int(batchsize))  # elasticsearch.go:103
        self.first_field_all = first_field_all
        self.transport = transport_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from log_formatter_ray.stages.route import render_template

        n = len(batch)
        if n == 0:
            return pa.table(
                {"n_docs": pa.array([], pa.int64()),
                 "errors": pa.array([], pa.int64())}
            )
        idx = render_template(batch, self.index,
                              first_field_all=self.first_field_all)
        # one C-speed records→ndjson serialize for the whole batch
        doc_lines = batch.to_pandas().to_json(
            orient="records", lines=True, date_format="iso"
        ).split("\n")
        if doc_lines and doc_lines[-1] == "":
            doc_lines.pop()
        action_lines = [
            '{"create": {"_index": "%s"}}' % s for s in idx.to_pylist()
        ]
        lines = np.empty(2 * n, dtype=object)
        lines[0::2] = action_lines
        lines[1::2] = doc_lines

        n_docs, errors = [], []
        for s in range(0, n, self.chunk):
            e = min(s + self.chunk, n)
            body = ("\n".join(lines[2 * s : 2 * e]) + "\n").encode()
            resp = self.transport.bulk(body) or {}
            n_docs.append(e - s)
            errors.append(
                sum(1 for it in resp.get("items", [])
                    if next(iter(it.values()), {}).get("status", 200) >= 300)
                if resp.get("errors") else 0
            )
        return pa.table(
            {"n_docs": pa.array(n_docs, pa.int64()),
             "errors": pa.array(errors, pa.int64())}
        )


def elasticsearch_sink(ds, cfg: dict):
    """Sink entry (``SINKS["elasticsearch"]``): cfg keys mirror the
    reference's EsConfig (elasticsearch.go:21-25) — ``host``, ``index``
    (supports ``{{field}}``), ``batchsize`` — plus ``transport_factory``
    (injection point / test double), ``concurrency`` (actor pool: one
    client per actor), ``refresh``.  Returns total (n_docs, errors)."""
    host = cfg.get("host", "http://localhost:9200")
    factory = cfg.get("transport_factory")
    if factory is None:
        import functools

        factory = functools.partial(
            UrllibTransport, host, bool(cfg.get("refresh", True))
        )
    kwargs = dict(
        index=cfg["index"],
        transport_factory=factory,
        batchsize=cfg.get("batchsize", 100),
        first_field_all=bool(cfg.get("first_field_all", False)),
    )
    conc = cfg.get("concurrency")
    if conc:
        acks = ds.map_batches(
            ESBulkWriter, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", batch_size=None, concurrency=conc,
        )
    else:
        acks = ds.map_batches(
            ESBulkWriter(**kwargs), batch_format="pyarrow", batch_size=None,
        )
    df = acks.to_pandas()  # partials: one row per bulk request
    return {"n_docs": int(df["n_docs"].sum()),
            "errors": int(df["errors"].sum()),
            "requests": len(df)}
