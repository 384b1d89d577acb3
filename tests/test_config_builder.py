"""YAML config surface + PlanBuilder (reference config shape,
manager.go:90-120, util/config.go:57-80)."""

import collections
import os

import pyarrow.parquet as pq
import pytest

from log_formatter_ray.config import load_config_file, load_config_str
from log_formatter_ray.pipelines.builder import PlanBuilder, register_formatter


def test_mandatory_sections():
    with pytest.raises(ValueError, match="mandatory"):
        load_config_str("input:\n  items: {items: []}\n")


def test_include_fragments(tmp_path):
    (tmp_path / "in.yml").write_text("items:\n  items:\n    - {message: hi}\n")
    main = tmp_path / "main.yml"
    main.write_text(
        "input: !include in.yml\n"
        "pipeline:\n  formatters:\n    - forwarder: {}\n"
        "output:\n  console: {limit: 1}\n"
    )
    cfg = load_config_file(str(main))
    assert cfg["input"]["items"]["items"] == [{"message": "hi"}]


def test_end_to_end_config_pipeline(corpus_dir, tmp_path):
    """Full config-driven run over the sequences corpus: parse → filter →
    labels → route → partitioned parquet sink."""
    out = str(tmp_path / "out")
    cfg = load_config_str(
        f"""
input:
  parquet:
    path: {corpus_dir}
pipeline:
  formatters:
    - parser:
        components_regex: '^(?P<src_>\\w+)/(?P<day>\\d{{4}}-\\d{{2}}-\\d{{2}})/(?P<shard>\\d{{4}})-(?P<seq>\\d{{8}})$'
        target_field: doc_id
        error_tolerant: true
        ok_field: _ok
    - filter:
        include_fields: ["^doc_id$", "^tokens$", "^n_tok$", "^source$", "^day$", "^_ok$"]
  labels:
    env: test
route:
  rules:
    - sink: sink_quarantine
      when: [{{field: _ok, op: "==", value: false}}]
    - sink: sink_long
      when: [{{field: n_tok, op: ">=", value: 1024}}]
  default: sink_standard
output:
  parquet:
    path: {out}
    partition_cols: [sink]
"""
    )
    PlanBuilder(cfg).run()
    written = pq.read_table(out)
    assert len(written) == 5000  # cardinality conservation
    sinks = collections.Counter(written["sink"].to_pylist())
    assert sinks["sink_quarantine"] == 100
    assert set(written.column_names) == {
        "doc_id", "tokens", "n_tok", "source", "day", "_ok", "env", "sink",
    }
    assert written["env"].to_pylist()[0] == "test"


def test_enrich_from_config(tmp_path):
    import pyarrow as pa

    lookup = pa.table({"source": ["a", "b"], "tier": ["t1", "t2"]})
    lp = str(tmp_path / "lookup.parquet")
    pq.write_table(lookup, lp)
    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({"source": ["a", "b", "c"], "v": [1, 2, 3]}), src)
    cfg = load_config_str(
        f"""
input:
  parquet: {{path: {src}}}
pipeline:
  formatters:
    - enrich: {{lookup_path: {lp}, key: source}}
output:
  console: {{}}
"""
    )
    out = PlanBuilder(cfg).build().to_pandas().sort_values("v")
    assert out["tier"].tolist() == ["t1", "t2", None]


def test_register_custom_formatter():
    """The `.so`-plugin analog (formatter.go:38-73)."""

    def upper_stage(cfg):
        import pyarrow.compute as pc

        def apply(ds):
            return ds.map_batches(
                lambda t: t.set_column(
                    t.column_names.index("message"), "message",
                    pc.utf8_upper(t["message"]),
                ),
                batch_format="pyarrow",
            )

        return apply

    register_formatter("upper", upper_stage)
    cfg = load_config_str(
        """
input:
  items: {items: [{message: hi}]}
pipeline:
  formatters:
    - upper: {}
output:
  console: {}
"""
    )
    out = PlanBuilder(cfg).build().to_pandas()
    assert out["message"].tolist() == ["HI"]


def test_unknown_formatter_rejected():
    cfg = load_config_str(
        """
input: {items: {items: []}}
pipeline:
  formatters: [{nope: {}}]
output: {console: {}}
"""
    )
    with pytest.raises(ValueError, match="unknown formatter"):
        PlanBuilder(cfg).build()


def test_http_config_fetch():
    """Controller-served config (util/config.go:42-54 analog): load the
    same YAML over a localhost HTTP server."""
    import http.server
    import threading

    from log_formatter_ray.config import load_config_file

    yml = b"""
input:
  parquet: {path: /tmp/x}
pipeline:
  formatters: []
output:
  parquet: {path: /tmp/y}
"""

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(yml)))
            self.end_headers()
            self.wfile.write(yml)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = load_config_file(f"http://127.0.0.1:{srv.server_address[1]}/cfg.yml")
        assert cfg["input"] == {"parquet": {"path": "/tmp/x"}}
        assert "output" in cfg and "pipeline" in cfg
    finally:
        srv.shutdown()


def test_module_entrypoint_usage_and_import():
    """python -m log_formatter_ray is the ray-job-submit surface; bad
    argv returns usage (the e2e run is driven in /verify and above)."""
    from log_formatter_ray.__main__ import main

    assert main([]) == 2
