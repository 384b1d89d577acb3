"""Streaming-source connector layer: offset-based polling, the
handler-then-commit at-least-once discipline, the connector registry, and
the custom-Datasource escape hatch."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from log_formatter_ray.sources.streaming import (
    CONNECTORS,
    ItemsConnector,
    ParquetDirConnector,
    build_connector,
    commit_offset,
    load_offset,
    read_callbacks,
    register_connector,
    run_stream,
)


def _shard(path, ids):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "v": pa.array([i * 10 for i in ids], pa.int64())}),
        path,
    )


def test_parquet_dir_connector_delta_polls(tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    _shard(os.path.join(src, "a.parquet"), [1, 2])
    c = ParquetDirConnector(src, columns=["doc_id"])

    ds, off = c.poll(None)
    assert sorted(ds.to_pandas()["doc_id"]) == [1, 2]
    # nothing new → None, offset unchanged
    none, off2 = c.poll(off)
    assert none is None and off2 == off
    # a new shard arrives → only the delta
    _shard(os.path.join(src, "b.parquet"), [3])
    ds3, off3 = c.poll(off)
    assert sorted(ds3.to_pandas()["doc_id"]) == [3]
    # replaying the OLD offset re-delivers (the at-least-once property)
    replay, _ = c.poll(off)
    assert sorted(replay.to_pandas()["doc_id"]) == [3]
    assert set(off3) == {"a.parquet", "b.parquet"}


def test_run_stream_commits_after_handler_and_replays_on_crash(tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    _shard(os.path.join(src, "a.parquet"), [1, 2])
    _shard(os.path.join(src, "b.parquet"), [3])
    offset_path = str(tmp_path / "state" / "offset.json")
    seen: list[list[int]] = []

    def handler(ds):
        ids = sorted(ds.to_pandas()["doc_id"])
        seen.append(ids)
        return ids

    out = run_stream(
        ParquetDirConnector(src), handler, offset_path,
        interval_s=0, max_polls=1,
    )
    assert out == [[1, 2, 3]]
    assert set(load_offset(offset_path)) == {"a.parquet", "b.parquet"}

    # handler crash ⇒ offset NOT committed ⇒ restart replays the delta
    _shard(os.path.join(src, "c.parquet"), [4])

    def boom(ds):
        raise RuntimeError("crash before commit")

    with pytest.raises(RuntimeError):
        run_stream(ParquetDirConnector(src), boom, offset_path,
                   interval_s=0, max_polls=1)
    assert set(load_offset(offset_path)) == {"a.parquet", "b.parquet"}
    out2 = run_stream(
        ParquetDirConnector(src), handler, offset_path,
        interval_s=0, max_polls=1,
    )
    assert out2 == [[4]]  # the crashed delta is re-delivered

    # drain: consecutive empty polls end the loop
    out3 = run_stream(
        ParquetDirConnector(src), handler, offset_path,
        interval_s=0, empty_polls_to_drain=2,
    )
    assert out3 == []


def test_items_connector_and_registry():
    c = ItemsConnector()
    c.push({"message": "hello"}, {"message": "world"})
    ds, off = c.poll(None)
    assert ds.count() == 2 and off == 2
    assert c.poll(off)[0] is None
    c.push({"message": "again"})
    ds2, off2 = c.poll(off)
    assert ds2.to_pandas()["message"].tolist() == ["again"] and off2 == 3

    # registry is the .so-plugin analog: register, build by config
    register_connector("test_items", lambda cfg: ItemsConnector())
    conn = build_connector({"test_items": {}})
    assert isinstance(conn, ItemsConnector)
    assert "parquet_dir" in CONNECTORS
    with pytest.raises(ValueError):
        build_connector({"nope": {}})


def test_offset_commit_atomic_roundtrip(tmp_path):
    p = str(tmp_path / "offsets" / "o.json")
    assert load_offset(p) is None
    commit_offset(p, ["a", "b"])
    assert load_offset(p) == ["a", "b"]
    commit_offset(p, 7)
    assert load_offset(p) == 7


def test_callback_datasource_reads_in_workers():
    def make(lo):
        def fetch() -> pa.Table:
            return pa.table({"x": pa.array(range(lo, lo + 3), pa.int64())})
        return fetch

    ds = read_callbacks([make(0), make(10), make(20)])
    got = sorted(ds.to_pandas()["x"])
    assert got == [0, 1, 2, 10, 11, 12, 20, 21, 22]


def test_plan_builder_run_streaming_config_surface(tmp_path):
    """The reference config surface driven continuously: input names a
    stream connector, each delta runs the formatter chain, outputs land in
    per-delta dirs, offsets persist across runs."""
    from log_formatter_ray.pipelines.builder import PlanBuilder

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _shard(os.path.join(src, "a.parquet"), [1, 2])
    cfg = {
        "input": {"parquet_dir": {"path": src}},
        "pipeline": {"formatters": [{"forwarder": {}}]},
        "output": {"parquet": {"path": out}},
    }
    offset_path = str(tmp_path / "offset.json")
    pb = PlanBuilder(cfg)
    pb.run_streaming(offset_path, interval_s=0, max_polls=1)
    t1 = pq.read_table(out)
    assert sorted(t1["doc_id"].to_pylist()) == [1, 2]

    # second wave: only the new shard is processed, outputs accumulate
    _shard(os.path.join(src, "b.parquet"), [3, 4])
    PlanBuilder(cfg).run_streaming(offset_path, interval_s=0, max_polls=1)
    t2 = pq.read_table(out)
    assert sorted(t2["doc_id"].to_pylist()) == [1, 2, 3, 4]
    deltas = [d for d in os.listdir(out) if d.startswith("delta=")]
    assert len(deltas) == 2


# --- Kafka connector (mocked consumer; the sandbox has no broker) ----------

from log_formatter_ray.testing import MockKafkaClient  # worker-importable


def test_kafka_connector_json_decode_and_delta_polls():
    import functools

    from log_formatter_ray.sources.streaming import KafkaConnector

    log = {0: [b'{"doc_id": 1, "v": 10}', b'{"doc_id": 2, "v": 20}'],
           1: [b'{"doc_id": 3, "v": 30}']}
    c = KafkaConnector(
        "t", schema="json", workers=2,
        client_factory=functools.partial(MockKafkaClient, log),
    )
    ds, off = c.poll(None)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == [1, 2, 3]
    assert df["v"].tolist() == [10, 20, 30]
    assert off == {"0": 2, "1": 1}
    # caught up → None, offsets unchanged
    none, off2 = c.poll(off)
    assert none is None and off2 == off
    # new messages on one partition → only the delta
    log[1].append(b'{"doc_id": 4, "v": 40}')
    ds3, off3 = c.poll(off)
    assert ds3.to_pandas()["doc_id"].tolist() == [4]
    assert off3 == {"0": 2, "1": 2}
    # REPLAYING the old offset re-delivers (at-least-once seek semantics)
    replay, _ = c.poll(off)
    assert replay.to_pandas()["doc_id"].tolist() == [4]


def test_kafka_connector_raw_decode_and_max_records():
    import functools

    from log_formatter_ray.sources.streaming import KafkaConnector

    log = {0: [b"alpha", b"beta", b"gamma"]}
    c = KafkaConnector(
        "t", schema="raw", max_records=2,
        client_factory=functools.partial(MockKafkaClient, log),
    )
    ds, off = c.poll(None)
    assert ds.to_pandas()["message"].tolist() == ["alpha", "beta"]
    assert off == {"0": 2}  # bounded by max_records, not the watermark
    ds2, off2 = c.poll(off)
    assert ds2.to_pandas()["message"].tolist() == ["gamma"]
    assert off2 == {"0": 3}


def test_kafka_connector_crash_replay_through_pump(tmp_path):
    """The reference's commit-after-enqueue discipline end-to-end: a
    handler crash before commit leaves the offset untouched, and the
    restarted pump re-delivers the same messages (kafka.go:182-186)."""
    import functools

    from log_formatter_ray.sources.streaming import KafkaConnector

    log = {0: [b'{"doc_id": 1}', b'{"doc_id": 2}']}
    factory = functools.partial(MockKafkaClient, log)
    offset_path = str(tmp_path / "offset.json")

    def boom(ds):
        raise RuntimeError("crash before commit")

    with pytest.raises(RuntimeError):
        run_stream(
            KafkaConnector("t", client_factory=factory), boom, offset_path,
            interval_s=0, max_polls=1,
        )
    assert load_offset(offset_path) is None  # nothing committed

    seen = []
    run_stream(
        KafkaConnector("t", client_factory=factory),
        lambda ds: seen.extend(ds.to_pandas()["doc_id"].tolist()),
        offset_path, interval_s=0, max_polls=1,
    )
    assert sorted(seen) == [1, 2]  # the crashed delta replayed in full
    assert load_offset(offset_path) == {"0": 2}


def test_kafka_connector_registered_and_config_built():
    import functools

    from log_formatter_ray.sources.streaming import KafkaConnector

    assert "kafka" in CONNECTORS
    conn = build_connector(
        {"kafka": {"topic": "t", "schema": "raw", "worker": 4,
                   "client_factory": functools.partial(
                       MockKafkaClient, {0: [b"x"]})}}
    )
    assert isinstance(conn, KafkaConnector) and conn.workers == 4
    ds, off = conn.poll(None)
    assert ds.to_pandas()["message"].tolist() == ["x"] and off == {"0": 1}
    with pytest.raises(ValueError):
        KafkaConnector("t", schema="avro")
