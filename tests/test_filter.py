"""FieldFilter semantics vs the reference (filter.go:31-69)."""

import pytest

import ray.data as rd

from log_formatter_ray.stages.filter import FieldFilter, make_filter

COLS = ["message", "level", "ts", "internal_tag"]


def test_include_fields_name_regex():
    f = FieldFilter(include_fields=(r"^message$", r"^lev"))
    assert f.kept_columns(COLS) == ["message", "level"]


def test_exclude_fields_proper():
    # documented divergence: the reference compiles exclude_fields but never
    # applies it (filter.go:51-54 — exclude-only configs produce EMPTY docs);
    # we implement exclusion properly.
    f = FieldFilter(exclude_fields=(r"^internal_",))
    assert f.kept_columns(COLS) == ["message", "level", "ts"]


def test_both_set_is_config_error():
    # filter.go:44-49
    with pytest.raises(ValueError):
        FieldFilter(include_fields=(r"a",), exclude_fields=(r"b",))
    with pytest.raises(ValueError):
        FieldFilter()


def test_apply_selects_columns():
    ds = rd.from_items([{"message": "m", "level": "i", "internal_tag": "x"}])
    out = FieldFilter(include_fields=(r"^(message|level)$",)).apply(ds)
    assert set(out.schema().names) == {"message", "level"}


def test_make_filter():
    f = make_filter({"include_fields": ["^a$"]})
    assert f.include_fields == ("^a$",)
