"""YAML pipeline config — the reference's config surface, same shape.

The reference loads a YAML with mandatory top-level ``input`` /
``pipeline`` / ``output`` sections (/root/reference/agent/manager.go:90-120),
supports ``!include`` fragment files (/root/reference/util/config.go:57-80),
and validates mandatory fields per plugin (util/config.go:38-55).  This
module reproduces that surface:

    input:
      parquet: {path: /data/in}
    pipeline:
      worker: 8                 # parallelism hint (≈ pipeline.worker)
      formatters:
        - parser: {components_regex: ..., target_field: doc_id}
        - filter: {include_fields: ["^doc_", "^tokens$"]}
        - enrich: {lookup_path: dim.parquet, key: source}
        - forwarder: {}
      labels: {env: prod}       # static label merge (pipeline.go:169-171)
    route:                      # extension: the ES dynamic-index fan-out
      rules: [{sink: "sink_{{tier}}", when: [...]}]
      default: sink_standard
    output:
      parquet: {path: /data/out, partition_cols: [sink]}

HTTP config fetch (the reference's agent takes its config from the
controller over HTTP, util/config.go:42-54) is reproduced for http(s) URLs
via ``load_config_file("http://...")`` — fetched once at load, stdlib
urllib, no external deps.  ``!include`` stays file-relative (fragments
inside an HTTP-fetched config are not resolved remotely).
"""

from __future__ import annotations

import os
import urllib.request

import yaml


class _IncludeLoader(yaml.SafeLoader):
    """SafeLoader + ``!include other.yml`` resolved relative to the file."""

    def __init__(self, stream):
        self._root = os.path.dirname(getattr(stream, "name", "") or ".")
        super().__init__(stream)


def _include(loader: _IncludeLoader, node: yaml.Node):
    rel = loader.construct_scalar(node)
    path = os.path.join(loader._root, rel)
    with open(path) as f:
        return yaml.load(f, _IncludeLoader)


_IncludeLoader.add_constructor("!include", _include)

MANDATORY_SECTIONS = ("input", "pipeline", "output")  # manager.go:90-120


def load_config_file(path: str) -> dict:
    if path.startswith(("http://", "https://")):
        # controller-served config (util/config.go:42-54 analog); bounded
        # startup step — never hang on a wedged controller
        with urllib.request.urlopen(path, timeout=10) as r:
            text = r.read().decode()
        if "!include" in text:
            raise ValueError(
                "!include fragments are not supported in HTTP-fetched "
                "configs (no remote base path to resolve against)"
            )
        return load_config_str(text)
    with open(path) as f:
        cfg = yaml.load(f, _IncludeLoader)
    validate_config(cfg)
    return cfg


def load_config_str(text: str) -> dict:
    cfg = yaml.load(text, yaml.SafeLoader)
    validate_config(cfg)
    return cfg


def validate_config(cfg: dict) -> None:
    if not isinstance(cfg, dict):
        raise ValueError("config must be a mapping")
    missing = [s for s in MANDATORY_SECTIONS if s not in cfg]
    if missing:
        # same failure mode as the reference's mandatory-key check
        raise ValueError(f"config missing mandatory sections: {missing}")
