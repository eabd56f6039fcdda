"""utils/formatting.py and utils/reporting.py behavior (reference roles:
matrix_to_dataframe at gEconpy/model/statistics/formatting.py:4 and the
build report at gEconpy/model/build.py:748)."""

import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, matrix_to_dataframe, model_from_gcn
from geconpy_tpu.utils.reporting import build_report, model_to_html


@pytest.fixture(scope="module")
def rbc():
    return model_from_gcn(get_example_gcn("rbc"), verbose=False)


def test_matrix_labels_infer_variable_by_variable(rbc):
    n = rbc.n_variables
    df = matrix_to_dataframe(np.eye(n), rbc)
    assert list(df.index) == list(rbc.variables)
    assert list(df.columns) == list(rbc.variables)


def test_matrix_labels_infer_shock_axis(rbc):
    n, k = rbc.n_variables, len(rbc.shocks)
    df = matrix_to_dataframe(np.zeros((n, k)), rbc)
    assert list(df.columns) == list(rbc.shocks)
    assert list(df.index) == list(rbc.variables)


def test_matrix_labels_explicit_equation_dim(rbc):
    n = rbc.n_variables
    df = matrix_to_dataframe(np.zeros((n, n)), rbc, dim1="equation",
                             dim2="variable")
    assert df.index[0].startswith("Equation")


def test_matrix_labels_reject_mismatched_shape(rbc):
    with pytest.raises(ValueError, match="matches neither"):
        matrix_to_dataframe(np.zeros((rbc.n_variables, 999)), rbc)
    with pytest.raises(ValueError, match="2-dimensional"):
        matrix_to_dataframe(np.zeros(4), rbc)
    with pytest.raises(ValueError, match="unknown dimension"):
        matrix_to_dataframe(np.zeros((rbc.n_variables, rbc.n_variables)),
                            rbc, dim1="bananas", dim2="variable")


def test_matrix_round_option(rbc):
    n = rbc.n_variables
    df = matrix_to_dataframe(np.full((n, n), 1.23456), rbc, round=2)
    assert float(df.iloc[0, 0]) == 1.23


def test_build_report_counts_every_section(rbc):
    """The build report's counts must reflect the model exactly (equation,
    variable, shock and parameter tallies + the DR timing split)."""
    report = build_report(rbc)
    n = rbc.n_variables
    assert f"{n} equations" in report
    assert f"{n} variables" in report
    assert f"{len(rbc.shocks)} stochastic shock" in report
    assert f"{len(rbc.param_names)} free parameters" in report
    # timing split sums to the variable count
    import re

    m = re.search(r"(\d+) static, (\d+) predetermined, (\d+) mixed, "
                  r"(\d+) forward-looking", report)
    assert m and sum(int(g) for g in m.groups()) == n
    # tryreduce results are reported by name
    assert "tryreduce" in report and "U" in report
    assert "Steady state: fully analytic" in report


def test_model_html_contains_equations(rbc):
    html = model_to_html(rbc)
    assert "<" in html and "block" in html.lower()
    # every block name appears
    for bname in rbc.primitives.blocks:
        assert str(bname) in html
