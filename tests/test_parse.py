"""Parser semantics vs the reference (parser.go:62-107) on hand goldens,
plus a pure-Python ``re`` oracle over the synthetic corpus."""

import re

import pyarrow as pa
import pytest

from log_formatter_ray.fixtures import make_golden_messages
from log_formatter_ray.stages.parse import GrokParser, LabelSpec, make_parser

GOLDEN_PATTERN = r"^(?P<date>\d{4}-\d{2}-\d{2}) (?P<time>\d{2}:\d{2}:\d{2}) (?P<body>.*)$"


def test_golden_messages_parse():
    p = GrokParser(components_regex=GOLDEN_PATTERN, target_field="message")
    out = p(make_golden_messages())
    assert len(out) == 63  # cardinality conservation (check-same-line.sh)
    assert out["date"][0].as_py() == "2020-11-13"
    assert out["time"][0].as_py() == "11:28:05"
    assert out["body"].to_pylist() == ["hello world"] * 63


def test_discard_groups_are_dropped():
    # `_`-suffixed group: extracted but discarded (parser.go:90-92,100-102)
    t = pa.table({"message": ["a-1", "b-2"]})
    p = GrokParser(components_regex=r"^(?P<word_>\w)-(?P<num>\d)$", target_field="message")
    out = p(t)
    assert "word_" not in out.column_names
    assert out["num"].to_pylist() == ["1", "2"]


def test_labels_run_on_discarded_components():
    # a `_` component is still usable as a label component
    t = pa.table({"message": ["abc-1"]})
    p = GrokParser(
        components_regex=r"^(?P<word_>\w+)-(?P<num>\d)$",
        target_field="message",
        labels=(LabelSpec(component="word_", regexprs=(r"^(?P<first>.)",)),),
    )
    out = p(t)
    assert out["first"].to_pylist() == ["a"]
    assert "word_" not in out.column_names


def test_component_overwrites_label_on_collision():
    # parser.go:92-104: labelMaps merge during the loop, componentMap merges
    # AFTER — the component group wins a name collision.
    t = pa.table({"message": ["x-y"]})
    p = GrokParser(
        components_regex=r"^(?P<a>\w)-(?P<b>\w)$",
        target_field="message",
        labels=(LabelSpec(component="b", regexprs=(r"^(?P<a>\w)$",)),),
    )
    out = p(t)
    assert out["a"].to_pylist() == ["x"]  # component value, not label "y"


def test_label_last_matching_regex_wins():
    # each labelMap is merged in order → last MATCHING regex's value sticks
    t = pa.table({"message": ["ab-1", "zz-2"]})
    p = GrokParser(
        components_regex=r"^(?P<w>\w+)-(?P<n>\d)$",
        target_field="message",
        labels=(
            LabelSpec(
                component="w",
                regexprs=(r"^(?P<pick>..)", r"^(?P<pick>a)"),  # 2nd only matches "ab"
            ),
        ),
    )
    out = p(t)
    assert out["pick"].to_pylist() == ["a", "zz"]  # row2 keeps the 1st regex's value


def test_optional_group_empty_string_parity():
    # Go FindStringSubmatch gives "" for a non-participating optional group
    # and the reference merges that "" into the doc; Arrow extract_regex
    # does the same.
    t = pa.table({"message": ["x", "xy"]})
    p = GrokParser(components_regex=r"^(?P<a>x)(?P<b>y)?$", target_field="message")
    out = p(t)
    assert out["b"].to_pylist() == ["", "y"]


def test_drop_mode_drops_nonmatching():
    t = pa.table({"message": ["good-1", "BAD", "good-2"], "keep": [10, 20, 30]})
    p = GrokParser(components_regex=r"^good-(?P<n>\d)$", target_field="message")
    out = p(t)
    assert out["keep"].to_pylist() == [10, 30]  # drop semantics pipeline.go:158-167
    assert out["n"].to_pylist() == ["1", "2"]


def test_tolerant_mode_passes_through_unenriched():
    t = pa.table({"message": ["good-1", "BAD"]})
    p = GrokParser(
        components_regex=r"^good-(?P<n>\d)$",
        target_field="message",
        error_tolerant=True,
        ok_field="_ok",
    )
    out = p(t)
    assert len(out) == 2
    assert out["n"].to_pylist() == ["1", None]
    assert out["_ok"].to_pylist() == [True, False]


def test_label_failure_is_soft():
    # parser.go:86-89: a label-regex miss is logged and skipped — the doc is
    # NOT dropped (even with error_tolerant=false) and component fields stay.
    t = pa.table({"message": ["ab-1", "zz-2", "NOPE"]})
    spec = dict(
        components_regex=r"^(?P<w>\w+)-(?P<n>\d)$",
        target_field="message",
        labels=(LabelSpec(component="w", regexprs=(r"^(?P<first>a)",)),),
    )
    strict = GrokParser(**spec)
    out = strict(t)
    # only the COMPONENTS mismatch ("NOPE") drops; the label miss ("zz") stays
    assert out["n"].to_pylist() == ["1", "2"]
    assert out["first"].to_pylist() == ["a", None]
    tolerant = GrokParser(**spec, error_tolerant=True)
    out2 = tolerant(t)
    assert out2["n"].to_pylist() == ["1", "2", None]
    assert out2["first"].to_pylist() == ["a", None, None]


def test_missing_target_field():
    t = pa.table({"other": ["x"]})
    strict = GrokParser(components_regex=r"(?P<a>.)", target_field="message")
    assert len(strict(t)) == 0  # error ⇒ drop (parser.go:63-69)
    tolerant = GrokParser(
        components_regex=r"(?P<a>.)", target_field="message", error_tolerant=True
    )
    out = tolerant(t)
    assert len(out) == 1 and out["other"].to_pylist() == ["x"]


def test_casts_extension():
    t = pa.table({"message": ["v=42"]})
    p = GrokParser(
        components_regex=r"^v=(?P<v>\d+)$",
        target_field="message",
        casts={"v": pa.int64()},
    )
    assert p(t)["v"].to_pylist() == [42]


def test_config_validation():
    with pytest.raises(ValueError):
        GrokParser(components_regex="no groups", target_field="m")
    with pytest.raises(ValueError):
        GrokParser(
            components_regex=r"(?P<a>.)",
            target_field="m",
            labels=(LabelSpec(component="nope", regexprs=(r"(?P<x>.)",)),),
        )


def test_make_parser_from_config():
    p = make_parser(
        {
            "components_regex": r"^(?P<a>\w+)$",
            "target_field": "message",
            "error_tolerant": True,
            "casts": {"a": "string"},
        }
    )
    assert p.error_tolerant


def test_python_re_oracle(seq_batch):
    """Vectorized parse ≡ doc-at-a-time Python re (the reference's loop)."""
    from log_formatter_ray.pipelines.flagship import DOC_ID_PATTERN

    p = GrokParser(components_regex=DOC_ID_PATTERN, target_field="doc_id")
    out = p(seq_batch)
    rx = re.compile(DOC_ID_PATTERN)
    expected = [m.groupdict() for m in map(rx.match, seq_batch["doc_id"].to_pylist()) if m]
    assert len(out) == len(expected)
    for col in ("day", "shard", "seq"):
        assert out[col].to_pylist() == [e[col] for e in expected]


def test_tolerant_failure_preserves_existing_column():
    # a capture group named like an EXISTING column must not null the old
    # value on parse-failed rows (reference returns the doc untouched)
    t = pa.table({"doc_id": ["web/x", "BAD"], "source": ["orig1", "orig2"]})
    p = GrokParser(
        components_regex=r"^(?P<source>\w+)/x$",
        target_field="doc_id",
        error_tolerant=True,
    )
    out = p(t)
    assert out["source"].to_pylist() == ["web", "orig2"]
