"""Diagnostic-quality depth tests: caret columns point at the offending
token, did-you-mean suggestions fire on near-miss names, the rustc-style
renderer shows code/locus/caret/fix, and filenames/lines propagate.

Coverage model: the reference's ``tests/parser/test_error_locations.py``
(19 tests), ``test_suggestions.py`` (37) and ``test_formatting.py`` (22) —
cases hand-derived for this front-end, not ports.
"""

import pytest

from geconpy_tpu.lang.errors import (
    ERROR_CATALOG,
    GCNError,
    GCNErrorCollection,
    ParseLocation,
    format_error,
    suggest,
)
from geconpy_tpu.lang.preprocessor import preprocess


def first_error(src, **kw):
    with pytest.raises((GCNError, GCNErrorCollection)) as exc:
        preprocess(src, **kw)
    err = exc.value
    if isinstance(err, GCNErrorCollection):
        return err.errors[0]
    return err


def caret_start(err):
    """Column where the caret underline begins."""
    return len(err.loc.caret_line()) - len(err.loc.caret_line().lstrip())


# ---------------------------------------------------------------------------
# caret columns point at the offending token
# ---------------------------------------------------------------------------

def test_unexpected_character_caret_on_the_character():
    src = "block B { identities { X[] = $ 1; }; };"
    err = first_error(src)
    assert err.code == "E001"
    assert src[caret_start(err)] == "$"
    assert err.loc.source_line == src


def test_missing_semicolon_caret_at_closing_brace():
    src = "block B { identities { X[] = 1; } };"
    err = first_error(src)
    assert err.code == "E003"
    # the caret points at the token found where ';' was required
    assert src[caret_start(err)] == "}"


def test_missing_equals_caret_at_second_expression():
    src = "block B { identities { X[] 1; }; };"
    err = first_error(src)
    assert err.code == "E005"
    assert src[caret_start(err)] == "1"


def test_invalid_time_index_caret_inside_brackets():
    src = "block B { identities { X[foo] = 1; }; };"
    err = first_error(src)
    assert err.code == "E008"
    assert src[caret_start(err):caret_start(err) + 3] == "foo"


def test_unknown_component_caret_on_component_name():
    src = "block B { identitees { X[] = 1; }; };"
    err = first_error(src)
    assert err.code == "E010"
    assert src[caret_start(err):caret_start(err) + 10] == "identitees"


def test_error_line_number_on_multiline_source():
    src = "block B\n{\n    identities { X[] 1; };\n};"
    err = first_error(src)
    assert err.code == "E005"
    assert err.loc.line == 3
    assert err.loc.source_line == "    identities { X[] 1; };"
    # column is within that line and points at the "1"
    assert err.loc.source_line[caret_start(err)] == "1"


def test_caret_spans_multicharacter_token():
    loc = ParseLocation(line=1, column=4, end_column=9, source_line="abc defgh x")
    assert loc.caret_line() == "    ^^^^^"


# ---------------------------------------------------------------------------
# did-you-mean suggestions
# ---------------------------------------------------------------------------

def test_component_typo_suggests_real_component():
    err = first_error("block B { identitees { X[] = 1; }; };")
    assert "identities" in err.suggestions


def test_top_level_typo_suggests_block_keyword():
    err = first_error("blok B { identities { X[] = 1; }; };")
    assert err.code == "E009"
    assert "block" in err.suggestions


def test_tag_typo_suggests_valid_tag():
    err = first_error("block B { identities { @exclud X[] = 1; }; };")
    assert "exclude" in err.suggestions


def test_assumption_category_typo_suggests_category():
    src = ("assumptions { positiv { X[]; }; }; "
           "block B { identities { X[] = 1; }; };")
    err = first_error(src)
    assert err.code == "E108"
    assert "positive" in err.suggestions


def test_tryreduce_unknown_variable_suggests_close_name():
    src = ("tryreduce { Consumption[]; }; "
           "block B { identities { Consumptio[] = 1; }; };")
    err = first_error(src)
    assert err.code == "E112"
    assert "Consumptio" in err.suggestions


def test_unknown_distribution_suggests_close_name():
    from geconpy_tpu.dists.from_ast import ast_to_distribution
    from geconpy_tpu.lang import parse_gcn

    model = parse_gcn("block B { identities { X[] = a; }; "
                      "calibration { a ~ Normel(mu=0, sigma=1) = 0.3; }; };")
    dist_ast = model.blocks[0].get("calibration").distributions[0]
    with pytest.raises(GCNError) as exc:
        ast_to_distribution(dist_ast)
    assert exc.value.code == "E012"
    assert "normal" in exc.value.suggestions


def test_uncalibrated_parameter_suggests_calibrated_name():
    import geconpy_tpu

    src = """
    block B {
        identities { X[] = alpha_k * X[-1] + epsilon[]; };
        shocks { epsilon[]; };
        calibration { alpha_c = 0.5; };
    };
    """
    with pytest.raises((GCNError, GCNErrorCollection)) as exc:
        geconpy_tpu.model_from_gcn(src, verbose=False)
    err = exc.value
    errors = err.errors if isinstance(err, GCNErrorCollection) else [err]
    e102 = [e for e in errors if e.code == "E102"]
    assert e102 and "alpha_c" in e102[0].suggestions


def test_suggest_orders_by_similarity_and_caps_at_n():
    got = suggest("bta", ["beta", "alpha", "theta", "btam", "bt"])
    assert got and got[0] in ("bta", "beta", "btam", "bt")
    assert len(got) <= 3
    # nothing remotely similar -> no noise suggestions
    assert suggest("zzz_qqq", ["beta", "alpha", "theta"]) == []


# ---------------------------------------------------------------------------
# renderer
# ---------------------------------------------------------------------------

def test_format_error_shows_code_locus_caret_and_fix():
    src = "block B { identities { X[foo] = 1; }; };"
    err = first_error(src, filename="model.gcn")
    text = str(err)
    assert "error[E008]" in text
    assert "model.gcn:1:" in text
    assert "^" in text
    assert ERROR_CATALOG["E008"].title in text
    assert ERROR_CATALOG["E008"].fix in text


def test_format_error_column_is_one_based_in_locus():
    src = "block B { identities { X[] = $ 1; }; };"
    err = first_error(src)
    col0 = caret_start(err)
    assert f":{err.loc.line}:{col0 + 1}" in str(err)


def test_format_error_includes_suggestions_line():
    err = first_error("block B { identitees { X[] = 1; }; };")
    assert "did you mean" in str(err)
    assert "'identities'" in str(err)


def test_format_error_color_mode_wraps_ansi():
    text = format_error("E003", "msg", None, color=True)
    assert "\x1b[31m" in text and "\x1b[0m" in text
    plain = format_error("E003", "msg", None, color=False)
    assert "\x1b[" not in plain


def test_format_error_unknown_code_falls_back():
    text = format_error("E999", "mystery", None)
    assert "error[E999]" in text
    assert "mystery" in text


def test_error_collection_lists_every_code():
    src = """
    block B {
        identities { X[] = alpha * X[-1] + epsilon[]; };
        shocks { epsilon[]; };
    };
    """
    import geconpy_tpu

    with pytest.raises((GCNError, GCNErrorCollection)) as exc:
        geconpy_tpu.model_from_gcn(src, verbose=False)
    err = exc.value
    errors = err.errors if isinstance(err, GCNErrorCollection) else [err]
    text = str(err)
    assert errors
    for e in errors:
        assert e.code in text


# ---------------------------------------------------------------------------
# catalog hygiene
# ---------------------------------------------------------------------------

def test_every_raised_code_is_in_the_catalog():
    """grep the package for raised/collected codes; each must have a catalog
    entry with a nonempty title and explanation (the renderer leans on it)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[2] / "geconpy_tpu"
    raised = set()
    for py in pkg.rglob("*.py"):
        raised |= set(re.findall(r"[\"'](E\d{3})[\"']", py.read_text()))
    missing = sorted(raised - set(ERROR_CATALOG))
    assert not missing, f"codes raised but not in catalog: {missing}"
    for code in sorted(raised):
        info = ERROR_CATALOG[code]
        assert info.title and info.explanation


def test_catalog_codes_are_unique_and_well_formed():
    import re

    assert len(ERROR_CATALOG) >= 30
    for code, info in ERROR_CATALOG.items():
        assert re.fullmatch(r"E\d{3}", code)
        assert info.code == code
