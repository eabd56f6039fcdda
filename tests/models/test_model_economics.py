"""Economic-mechanism assertions across the NK/RBC library variants that
lack dedicated behavior tests (each pins the model's defining mechanism,
mirroring the reference's per-model sign tests)."""

import numpy as np
import pytest

from geconpy_tpu import (
    get_example_gcn,
    impulse_response_function,
    model_from_gcn,
)

_CACHE = {}


def _irf(name, periods=40):
    if name not in _CACHE:
        model = model_from_gcn(get_example_gcn(name), verbose=False)
        sol = model.solve_model(verbose=False)
        _CACHE[name] = (model, sol,
                        impulse_response_function(sol, periods=periods,
                                                  shock_size=0.01))
    return _CACHE[name]


def test_money_growth_shock_is_inflationary():
    """nk_money_growth: a money-growth innovation raises inflation on
    impact and (with sticky prices) raises output temporarily."""
    model, sol, irf = _irf("nk_money_growth")
    shock = [s for s in model.shocks if "mu" in s or "m" in s.lower()][0]
    on_impact = irf.loc[(shock, 0)]
    assert on_impact["pi"] > 0
    assert on_impact["Y"] > 0


def test_fiscal_and_monetary_shocks_in_taxes_model():
    """nk_taxes: government spending crowds out consumption while raising
    output and hours (negative wealth effect); a monetary tightening is
    contractionary and disinflationary."""
    model, sol, irf = _irf("nk_taxes")
    g = irf.loc[("epsilon_g", 0)]
    assert g["C"] < 0 and g["L"] > 0 and g["Y"] > 0
    m = irf.loc[("epsilon_R", 0)]
    assert m["Y"] < 0 and m["L"] < 0 and m["pi"] < 0


def test_soe_productivity_depreciates_terms_of_trade():
    """nk_soe (Gali-Monacelli): a domestic productivity improvement raises
    output and depreciates the terms of trade / real exchange rate (home
    goods get cheaper)."""
    model, sol, irf = _irf("nk_soe")
    shock = [s for s in model.shocks if "a" in s.lower()][0]
    on_impact = irf.loc[(shock, 0)]
    assert on_impact["y"] > 0 if "y" in irf.columns else on_impact["Y"] > 0
    tot_candidates = [c for c in irf.columns if c in ("s", "tot", "q")]
    assert tot_candidates, f"no terms-of-trade variable in {list(irf.columns)}"
    assert on_impact[tot_candidates[0]] > 0


def test_brock_mirman_consumption_output_ratio_constant():
    """The BM policy implies C/Y = 1 - alpha*beta exactly: in log deviations
    c_hat == y_hat along ANY impulse response."""
    model, sol, irf = _irf("brock_mirman")
    path = irf.loc["epsilon"] if "epsilon" in irf.index else \
        irf.loc[model.shocks[0]]
    np.testing.assert_allclose(path["C"].to_numpy(), path["Y"].to_numpy(),
                               atol=1e-10)


def test_two_agent_aggregates_are_population_weighted():
    """rbc_two_agent: aggregate consumption response is a convex combination
    of the two agents' responses (the aggregation identity at work)."""
    model, sol, irf = _irf("rbc_two_agent")
    path = irf.loc[model.shocks[0]]
    cols = set(irf.columns)
    if not {"C", "C_c", "C_w"} <= cols:
        pytest.skip(f"aggregate layout differs: {sorted(cols)}")
    lo = np.minimum(path["C_c"].to_numpy(), path["C_w"].to_numpy())
    hi = np.maximum(path["C_c"].to_numpy(), path["C_w"].to_numpy())
    c = path["C"].to_numpy()
    # IRFs are log deviations: the level identity C = n C_c + (1-n) C_w
    # bounds the aggregate log deviation between the two (to first order,
    # weights scaled by steady-state shares; allow slack for the shares)
    assert (c >= lo - 0.5 * np.abs(lo) - 1e-9).all()
    assert (c <= hi + 0.5 * np.abs(hi) + 1e-9).all()


def test_burnside_impact_matches_closed_form_loading():
    """The price-dividend impact equals the closed-form loading S1 = sum
    q^i b_i exactly (in log deviations: S1 * eps / y_ss).  With Burnside's
    rho < 0, theta*rho > 0, so the loading is POSITIVE despite theta < 0."""
    model, sol, irf = _irf("burnside")
    beta, theta, rho, xbar = 0.95, -1.5, -0.139, 0.0179
    i = np.arange(1, 4001)
    q = beta * np.exp(theta * xbar)
    S1 = float(np.sum(q ** i * theta * rho * (1 - rho ** i) / (1 - rho)))
    y_ss = q / (1 - q)
    on_impact = irf.loc[(model.shocks[0], 0)]
    np.testing.assert_allclose(on_impact["y"], S1 * 0.01 / y_ss, rtol=1e-8)
    assert S1 > 0


def test_open_rbc_debt_reverts_to_target():
    """open_rbc: the debt-elastic premium makes B mean-revert — after a
    productivity shock the IRF of B dies out instead of following a unit
    root (the standard SOE stationarity device)."""
    model, sol, irf = _irf("open_rbc", periods=400)
    path = irf.loc[(model.shocks[0],)]["B"].to_numpy()
    assert np.abs(path[-1]) < 0.05 * np.abs(path).max()


def test_tank_hand_to_mouth_consumes_wage_income():
    """rbc_tank: the constrained household's budget C_h = w L_h holds as an
    exact log-deviation identity (c_h = w + l_h) along the whole IRF."""
    model, sol, irf = _irf("rbc_tank")
    for shock in model.shocks:
        path = irf.loc[shock]
        np.testing.assert_allclose(
            path["C_h"].to_numpy(),
            path["w"].to_numpy() + path["L_h"].to_numpy(),
            atol=1e-9, err_msg=shock)
