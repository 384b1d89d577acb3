"""Router / template semantics (ES dynamic-index fan-out analog,
util/config.go:16-32, elasticsearch.go:81,109-113)."""

import pyarrow as pa
import pytest

from log_formatter_ray.stages.route import (
    Condition,
    Router,
    RouteRule,
    make_router,
    render_template,
)


def _batch():
    return pa.table(
        {
            "source": ["web", "books", "misc", "web"],
            "tier": ["premium", "standard", None, "premium"],
            "n_tok": [2000, 100, 1500, 10],
        }
    )


def test_template_rendering_per_row():
    out = render_template(_batch(), "idx-{{source}}")
    assert out.to_pylist() == ["idx-web", "idx-books", "idx-misc", "idx-web"]


def test_template_multiple_fields_and_null():
    out = render_template(_batch(), "{{source}}/{{tier}}")
    assert out.to_pylist() == ["web/premium", "books/standard", "misc/null", "web/premium"]


def test_template_constant():
    assert render_template(_batch(), "fixed").to_pylist() == ["fixed"] * 4


def test_template_reference_first_field_quirk():
    # util/config.go:20-27: the reference replaces EVERY {{...}} slot with
    # the FIRST field's value; first_field_all=True replicates that.
    out = render_template(_batch(), "{{source}}/{{tier}}", first_field_all=True)
    assert out.to_pylist() == ["web/web", "books/books", "misc/misc", "web/web"]


def test_first_match_wins():
    r = Router(
        rules=(
            RouteRule(sink="premium", when=(Condition("tier", "==", "premium"),)),
            RouteRule(sink="long", when=(Condition("n_tok", ">=", 1024),)),
        ),
        default_sink="std",
    )
    out = r(_batch())
    # row0 matches both rules → first rule wins; null tier never matches ==
    assert out["sink"].to_pylist() == ["premium", "std", "long", "premium"]


def test_conditions_are_anded():
    r = Router(
        rules=(
            RouteRule(
                sink="both",
                when=(Condition("tier", "==", "premium"), Condition("n_tok", ">", 100)),
            ),
        ),
        default_sink="std",
    )
    assert r(_batch())["sink"].to_pylist() == ["both", "std", "std", "std"]


def test_condition_ops():
    b = _batch()
    assert Condition("source", "in", ["web", "misc"]).mask(b).to_pylist() == [
        True, False, True, True,
    ]
    assert Condition("source", "not_in", ["web"]).mask(b).to_pylist() == [
        False, True, True, False,
    ]
    assert Condition("tier", "is_null").mask(b).to_pylist() == [False, False, True, False]
    assert Condition("tier", "not_null").mask(b).to_pylist() == [True, True, False, True]
    assert Condition("source", "match", "^w").mask(b).to_pylist() == [
        True, False, False, True,
    ]
    with pytest.raises(ValueError):
        Condition("source", "???", 1).mask(b)


def test_templated_sink_rule():
    r = Router(rules=(), default_sink="sink_{{source}}", sink_field="dest")
    out = r(_batch())
    assert out["dest"].to_pylist() == [
        "sink_web", "sink_books", "sink_misc", "sink_web",
    ]


def test_make_router_from_config():
    r = make_router(
        {
            "rules": [
                {"sink": "hot", "when": [{"field": "n_tok", "op": ">=", "value": 1024}]}
            ],
            "default": "cold",
        }
    )
    assert r(_batch())["sink"].to_pylist() == ["hot", "cold", "hot", "cold"]
