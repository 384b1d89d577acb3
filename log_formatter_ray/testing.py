"""Importable test helpers (fault injection) — worker processes must be able
to unpickle these, so they cannot live in the pytest modules."""

from __future__ import annotations

import os

import pyarrow as pa

from log_formatter_ray.pipelines.flagship import RouteAndWrite


class CrashOnceAfterWrite(RouteAndWrite):
    """Fault injection: write the batch's files, then die on the first
    attempt per batch — simulating a worker lost between its side-effect
    write and task completion.  Used to prove retry idempotence (the
    content-hashed filenames make the retry overwrite, not append)."""

    def __init__(self, router, data_dir, flag_dir, **kw):
        super().__init__(router, data_dir, **kw)
        self.flag_dir = flag_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)  # files are on disk now
        key = batch["doc_id"][0].as_py().replace("/", "_")
        flag = os.path.join(self.flag_dir, key)
        if not os.path.exists(flag):
            with open(flag, "w") as f:
                f.write("crashed once")
            raise RuntimeError("injected failure after write")
        return out


class MockKafkaClient:
    """Reference implementation of the ``KafkaConnector`` consumer
    protocol over an in-memory ``{partition: [bytes, ...]}`` log —
    the mocked-broker test double (this sandbox has no Kafka), and the
    documented protocol surface a real client must provide:
    ``partitions(topic)``, ``end_offset(topic, p)``,
    ``fetch(topic, p, start, end)`` (repeatable — seek semantics).
    Picklable plain-dict state, so per-partition fetches really run
    inside Ray read tasks."""

    def __init__(self, log):
        self.log = {int(k): list(v) for k, v in log.items()}

    def partitions(self, topic):
        return sorted(self.log)

    def end_offset(self, topic, partition):
        return len(self.log[partition])

    def fetch(self, topic, partition, start, end):
        return self.log[partition][start:end]


class FileCaptureTransport:
    """Test double for the ES sink's transport protocol: each ``bulk``
    body is written to a uniquely-named file under ``dir`` (the bulk
    POSTs run inside Ray workers, so plain in-memory capture would be
    invisible to the driver).  Returns an empty-ok response."""

    def __init__(self, dir):
        self.dir = dir

    def bulk(self, body: bytes) -> dict:
        import os
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(self.dir, f"bulk_{uuid.uuid4().hex}.ndjson")
        with open(path, "wb") as f:
            f.write(body)
        return {"errors": False, "items": []}
