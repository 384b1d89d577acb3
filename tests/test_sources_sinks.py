"""Source/sink registries (the reference's input/output plugin surface)."""

import io
import json

import pyarrow.parquet as pq
import pytest

from log_formatter_ray.sinks import SINKS, register_sink, write_sink
from log_formatter_ray.sources import SOURCES, build_source, register_source


def test_parquet_source_column_pruning(corpus_dir):
    ds = build_source({"parquet": {"path": corpus_dir, "columns": ["doc_id", "source"]}})
    assert set(ds.schema().names) == {"doc_id", "source"}


def test_text_source(tmp_path):
    p = tmp_path / "log.txt"
    p.write_text("line one\nline two\n")
    ds = build_source({"text": {"path": str(p)}})
    assert ds.to_pandas()["message"].tolist() == ["line one", "line two"]


def test_console_source_stream():
    # reference console input shape: each line → {"message": line}
    ds = build_source({"console": {"stream": io.StringIO("a\nb\n")}})
    assert ds.to_pandas()["message"].tolist() == ["a", "b"]


def test_json_source_nested(tmp_path):
    p = tmp_path / "rows.json"
    rows = [{"message": "m", "meta": {"k": 1}}, {"message": "n", "meta": {"k": 2}}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = build_source({"json": {"path": str(p)}}).to_pandas()
    assert df["meta"].iloc[0]["k"] == 1  # nested JSON → struct column


def test_csv_source(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = build_source({"csv": {"path": str(p)}}).to_pandas()
    assert df["a"].tolist() == [1, 2]


def test_unknown_source_and_sink():
    with pytest.raises(ValueError, match="unknown source"):
        build_source({"nope": {}})
    import ray.data as rd

    with pytest.raises(ValueError, match="unknown sink"):
        write_sink(rd.from_items([{"x": 1}]), {"nope": {}})


def test_register_source_plugin():
    register_source("fake", lambda cfg: __import__("ray").data.range(cfg["n"]))
    assert build_source({"fake": {"n": 3}}).count() == 3
    del SOURCES["fake"]


def test_parquet_sink_partitioned(tmp_path):
    import ray.data as rd

    ds = rd.from_items([{"v": 1, "sink": "a"}, {"v": 2, "sink": "b"}])
    out = str(tmp_path / "out")
    write_sink(ds, {"parquet": {"path": out, "partition_cols": ["sink"]}})
    t = pq.read_table(out)
    assert sorted(t["sink"].to_pylist()) == ["a", "b"]


def test_register_sink_plugin():
    captured = []
    register_sink("capture", lambda ds, cfg: captured.append(ds.count()))
    import ray.data as rd

    write_sink(rd.from_items([{"x": 1}]), {"capture": {}})
    assert captured == [1]
    del SINKS["capture"]


def test_csv_sink_roundtrip(tmp_path):
    import ray.data as rd

    ds = rd.range(10).map_batches(
        lambda b: {"id": b["id"], "name": [f"n{int(i)}" for i in b["id"]]},
        batch_format="numpy",
    )
    out = str(tmp_path / "csv_out")
    write_sink(ds, {"csv": {"path": out}})
    back = rd.read_csv(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert back["id"].tolist() == list(range(10))
    assert back["name"].tolist() == [f"n{i}" for i in range(10)]


def test_file_sink_alias_registered():
    assert "file" in SINKS and SINKS["file"] is SINKS["csv"]


def test_read_parquet_clean_strategies(tmp_path):
    """The three clean-read strategies: dirty footer → explicit projected
    schema (blocks AND inferred schema hashable); dirty + include_paths →
    _block_udf strip; clean footer / directory → plain read untouched."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_formatter_ray.sources import read_parquet_clean

    dirty = str(tmp_path / "dirty.parquet")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(dirty)
    assert pq.read_schema(dirty).metadata  # pandas wrote its blob

    ds = read_parquet_clean(dirty, columns=["a"])
    b = ds.take_batch(3, batch_format="pyarrow")
    assert b.schema.metadata is None
    hash(b.schema)  # must not raise
    assert sorted(b["a"].to_pylist()) == [1, 2, 3]

    ds2 = read_parquet_clean(dirty, include_paths=True)
    b2 = ds2.take_batch(3, batch_format="pyarrow")
    assert not b2.schema.metadata
    assert "path" in b2.schema.names

    clean_f = str(tmp_path / "clean.parquet")
    pq.write_table(pa.table({"a": pa.array([7], pa.int64())}), clean_f)
    b3 = read_parquet_clean(clean_f).take_batch(1, batch_format="pyarrow")
    assert not b3.schema.metadata

    d = str(tmp_path / "adir")
    import os as _os

    _os.makedirs(d)
    pq.write_table(pa.table({"a": pa.array([9], pa.int64())}), d + "/p.parquet")
    assert read_parquet_clean(d).take_batch(1, batch_format="pyarrow")[
        "a"
    ].to_pylist() == [9]


def test_read_parquet_clean_mixed_list(tmp_path):
    """ADVICE r4: a CLEAN first file must not mask pandas-dirty later files
    in a list input — every block's schema must come out hashable."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_formatter_ray.sources import read_parquet_clean

    clean_f = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), clean_f)
    dirty_f = str(tmp_path / "d.parquet")
    pd.DataFrame({"a": [3, 4]}).to_parquet(dirty_f)
    assert pq.read_schema(dirty_f).metadata

    ds = read_parquet_clean([clean_f, dirty_f])
    vals = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        assert not b.schema.metadata, "dirty later file leaked its footer"
        hash(b.schema)  # must not raise
        vals += b["a"].to_pylist()
    assert sorted(vals) == [1, 2, 3, 4]

    # include_paths variant: the short-circuit probe must find the dirty
    # SECOND file and strip inside the read tasks
    ds2 = read_parquet_clean([clean_f, dirty_f], include_paths=True)
    for b in ds2.iter_batches(batch_format="pyarrow", batch_size=None):
        assert not b.schema.metadata
        assert "path" in b.schema.names


def test_compat_shim_degrades_cleanly_on_import_failure(monkeypatch):
    """VERDICT r4 item 8: a Ray upgrade that moves the private
    pandas_block module must degrade the shim to a logged no-op, never an
    import error."""
    import sys

    import log_formatter_ray._compat as compat

    monkeypatch.setattr(compat, "_patched", False)
    monkeypatch.setitem(
        sys.modules, "ray.data._internal.pandas_block", None
    )  # forces ImportError inside install()
    compat.install()  # must not raise
    assert compat._patched  # and must not retry forever


def test_elasticsearch_bulk_sink_dynamic_index_and_batching(tmp_path):
    """The ES client sink (elasticsearch.go:39-166): NDJSON create-action
    bulk bodies, {{field}} dynamic index per doc, chunks of
    max(100, batchsize) docs, POSTs running inside Ray workers."""
    import functools

    import ray.data as rd

    from log_formatter_ray.testing import FileCaptureTransport

    cap = str(tmp_path / "bulks")
    rows = [{"level": "info" if i % 2 == 0 else "error", "n": i}
            for i in range(250)]
    ds = rd.from_items(rows).repartition(1)
    out = write_sink(ds, {
        "elasticsearch": {
            "index": "logs-{{level}}",
            "batchsize": 7,  # floors to the reference's min of 100
            "transport_factory": functools.partial(FileCaptureTransport, cap),
        }
    })
    assert out["n_docs"] == 250 and out["errors"] == 0
    assert out["requests"] == 3  # 250 docs / max(100, 7) → 100+100+50

    import glob

    lines = []
    for f in sorted(glob.glob(cap + "/bulk_*.ndjson")):
        body = open(f, "rb").read().decode()
        assert body.endswith("\n")
        lines += body.splitlines()
    assert len(lines) == 500  # action + doc per row
    actions = [json.loads(l) for l in lines[0::2]]
    docs = [json.loads(l) for l in lines[1::2]]
    for a, d in zip(actions, docs):
        want = "logs-error" if d["n"] % 2 else "logs-info"
        assert a == {"create": {"_index": want}}
    assert sorted(d["n"] for d in docs) == list(range(250))


def test_elasticsearch_sink_actor_pool_and_registry(tmp_path):
    import functools

    import ray.data as rd

    from log_formatter_ray.testing import FileCaptureTransport

    assert "elasticsearch" in SINKS
    cap = str(tmp_path / "bulks")
    ds = rd.from_items([{"k": "a"}, {"k": "b"}]).repartition(2)
    out = write_sink(ds, {
        "elasticsearch": {
            "index": "fixed",
            "concurrency": 2,  # one client per actor
            "transport_factory": functools.partial(FileCaptureTransport, cap),
        }
    })
    assert out == {"n_docs": 2, "errors": 0, "requests": 2}
