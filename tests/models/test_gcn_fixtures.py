"""File-based GCN fixture corpus (mirrors the reference's
tests/_resources/test_gcns + error_gcns span): deep lags/leads through the
full pipeline, partial vs full analytic steady state, linear models,
backward-looking models, calibrating equations, BK failures, and a battery
of deliberately broken files asserting specific error codes.
"""

import pathlib

import jax
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.lang.errors import (GCNError, GCNErrorCollection)

FIXTURES = pathlib.Path(__file__).parents[1] / "_gcn_fixtures"


def _load(name):
    return model_from_gcn(FIXTURES / name, verbose=False)


# --------------------------------------------------------------- deep lags
def test_sarima_deep_lags_full_pipeline():
    m = _load("sarima3_8.gcn")
    # lag depth 8 -> 7 auxiliary lag variables for x (x[-3] in the y
    # equation rides the same chain)
    aux = [v for v in m.variables if "__lag" in v or "_lag" in v]
    assert len(aux) == 7
    sol = m.solve_model(verbose=False)
    assert sol.success
    # AR coefficients survive the aux chain: x_t response to its own history
    # equals the ARMA recursion (simulate and compare against direct filter)
    irf = sol.impulse_responses(periods=12)
    x_irf = np.asarray(irf.loc["eps_x", "x"])
    direct = np.zeros(13)
    direct[0] = 1.0
    for t in range(1, 13):
        direct[t] = 0.5 * direct[t - 1]
        if t >= 2:
            direct[t] -= 0.2 * direct[t - 2]
        if t >= 8:
            direct[t] += 0.1 * direct[t - 8]
    np.testing.assert_allclose(x_irf[:12], direct[:12], atol=1e-9)


def test_deep_lead_full_pipeline():
    m = _load("deep_lead.gcn")
    sol = m.solve_model(solver="gensys", verbose=False)
    assert sol.success
    sol2 = m.solve_model(solver="cycle_reduction", verbose=False)
    np.testing.assert_allclose(sol.T.to_numpy(), sol2.T.to_numpy(),
                               atol=1e-8)


# ---------------------------------------------------------------- SS span
def test_partial_ss_matches_full_analytic():
    m_partial = _load("partial_ss.gcn")
    m_full = _load("partial_ss_full.gcn")
    sol_p = m_partial.solve_model(verbose=False)
    sol_f = m_full.solve_model(verbose=False)
    assert sol_p.success and sol_f.success
    ss_p = {str(k): float(v) for k, v in sol_p.steady_state.items()}
    ss_f = {str(k): float(v) for k, v in sol_f.steady_state.items()}
    for v in ("C_ss", "K_ss", "Y_ss"):
        np.testing.assert_allclose(ss_p[v], ss_f[v], rtol=1e-7)
    common = sorted(set(sol_p.T.index) & set(sol_f.T.index))
    np.testing.assert_allclose(
        sol_p.T.loc[common, common].to_numpy(),
        sol_f.T.loc[common, common].to_numpy(), atol=1e-7)


def test_linear_model_skips_loglin():
    m = _load("rbc_linear.gcn")
    assert m.primitives.is_linear
    sol = m.solve_model(verbose=False)
    assert sol.success
    # linear model: steady state is identically zero
    assert max(abs(v) for v in sol.steady_state.values()) < 1e-10


def test_backward_model_autodetects():
    m = _load("backward_var.gcn")
    assert m.is_backward_looking
    sol = m.solve_model(verbose=False)
    assert sol.success and sol.solver == "backward"
    np.testing.assert_allclose(sol.T.loc["x", "x"], 0.8, atol=1e-12)
    np.testing.assert_allclose(sol.T.loc["w", "z"],
                               0.5 * 2.0 + 0.1, atol=1e-12)


def test_calibrating_equation_pins_parameter():
    m = _load("calibrating_eq.gcn")
    ss = m.steady_state(verbose=False)
    assert ss.success
    vals = {str(k): float(v) for k, v in ss.items()}
    alpha, K = vals["alpha"], vals["K_ss"]
    # restriction: K / (A K^alpha) = 10 at the steady state
    np.testing.assert_allclose(K / K**alpha, 10.0, rtol=1e-6)


def test_pert_fails_flags_not_crashes():
    m = _load("pert_fails.gcn")
    sol = m.solve_model(solver="gensys", on_failure="ignore", verbose=False)
    assert not sol.success
    bk = m.check_bk_condition(verbose=False)
    assert not bk.attrs["bk_satisfied"]


# ------------------------------------------------------------ error corpus
ERROR_CASES = [
    ("err_orphan_param.gcn", "E103"),
    ("err_undefined_param.gcn", "E102"),
    ("err_duplicate_param.gcn", "E104"),
    ("err_undefined_var.gcn", "E101"),
    ("err_missing_semicolon.gcn", "E003"),
    ("err_unterminated_block.gcn", "E002"),
    ("err_bad_time_index.gcn", "E008"),
    ("err_unknown_dist.gcn", "E012"),
    ("err_control_not_in_problem.gcn", "E105"),
    ("err_duplicate_block.gcn", "E019"),
    ("err_ss_restriction.gcn", "E107"),
    ("err_missing_equals.gcn", "E005"),
    ("err_expected_expression.gcn", "E004"),
    ("err_missing_lhs.gcn", "E006"),
    ("err_missing_rhs.gcn", "E007"),
    ("err_missing_block_keyword.gcn", "E009"),
    ("err_unknown_component.gcn", "E010"),
    ("err_malformed_dist_arg.gcn", "E013"),
    ("err_empty_objective.gcn", "E014"),
    ("err_bad_multiplier.gcn", "E015"),
    ("err_bad_tag.gcn", "E020"),
    ("err_incomplete_problem.gcn", "E106"),
    ("err_duplicate_control.gcn", "E109"),
    ("err_shock_with_time_index.gcn", "E110"),
    ("err_objective_not_variable.gcn", "E111"),
    ("err_tryreduce_unknown.gcn", "E112"),
    ("err_unexpected_char.gcn", "E001"),
    ("err_missing_tilde.gcn", "E011"),
    ("err_bad_calibrating_target.gcn", "E016"),
    ("err_unexpected_token.gcn", "E017"),
    ("err_bad_options_entry.gcn", "E018"),
    ("err_bad_assumption.gcn", "E108"),
]


def _codes(err: Exception) -> set[str]:
    if isinstance(err, GCNErrorCollection):
        return {e.code for e in err.errors}
    return {getattr(err, "code", None)}


@pytest.mark.parametrize("fname,code", ERROR_CASES,
                         ids=[c[0].replace(".gcn", "") for c in ERROR_CASES])
def test_error_fixture_raises_specific_code(fname, code):
    with pytest.raises(GCNError) as excinfo:
        model_from_gcn(FIXTURES / "error_gcns" / fname, verbose=False)
    assert code in _codes(excinfo.value), (
        f"{fname}: expected {code}, got {_codes(excinfo.value)}: "
        f"{excinfo.value}")


def test_error_messages_carry_location_and_filename():
    with pytest.raises(GCNError) as excinfo:
        model_from_gcn(FIXTURES / "error_gcns" / "err_missing_semicolon.gcn",
                       verbose=False)
    msg = str(excinfo.value)
    assert "err_missing_semicolon.gcn" in msg or "line" in msg
