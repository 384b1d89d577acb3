"""LookupEnricher / StaticLabels semantics (broadcast enrich, no shuffle)."""

import pyarrow as pa

import ray

from log_formatter_ray.fixtures import make_source_lookup
from log_formatter_ray.stages.enrich import LookupEnricher, StaticLabels


def _batch():
    return pa.table({"source": ["web", "misc", "books", "web"], "x": [1, 2, 3, 4]})


def test_lookup_hit_and_miss():
    e = LookupEnricher(make_source_lookup(), key="source")
    out = e(_batch())
    tiers = out["tier"].to_pylist()
    assert tiers[0] == tiers[3] and tiers[0] is not None
    assert tiers[1] is None  # "misc" has no lookup row → null enrich
    assert out["weight"][1].as_py() is None


def test_lookup_value_cols_subset():
    e = LookupEnricher(make_source_lookup(), key="source", value_cols=["tier"])
    out = e(_batch())
    assert "tier" in out.column_names and "weight" not in out.column_names


def test_lookup_overwrites_existing_column():
    t = _batch().append_column("tier", pa.array(["old"] * 4))
    out = LookupEnricher(make_source_lookup(), key="source")(t)
    assert out["tier"][0].as_py() != "old"


def test_lookup_from_dict_form():
    e = LookupEnricher({"web": {"tier": "t1"}, "books": {"tier": "t2"}}, key="source")
    out = e(_batch())
    assert out["tier"].to_pylist() == ["t1", None, "t2", "t1"]


def test_lookup_from_object_ref_broadcast():
    ref = ray.put(make_source_lookup())
    e = LookupEnricher(ref, key="source")
    out = e(_batch())
    assert out["tier"].null_count == 1


def test_static_labels_reference_merge():
    # pipeline.go:169-171 — constant key→value merged into every doc
    out = StaticLabels({"env": "prod"})(_batch())
    assert out["env"].to_pylist() == ["prod"] * 4
