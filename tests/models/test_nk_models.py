import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn, impulse_response_function


@pytest.fixture(scope="module")
def nk3():
    return model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)


@pytest.fixture(scope="module")
def nk_full():
    return model_from_gcn(get_example_gcn("nk_full"), verbose=False)


def test_linear_model_zero_ss(nk3):
    assert nk3.primitives.is_linear
    assert not nk3.default_loglin
    ss = nk3.steady_state(verbose=False)
    assert ss.success
    assert all(abs(v) < 1e-12 for v in ss.to_string().values())


def test_nk3_solution_textbook_signs(nk3):
    sol = nk3.solve_model(verbose=False)
    assert sol.success
    # contractionary monetary shock lowers inflation and the output gap
    assert sol.R.loc["pi", "epsilon_v"] < 0
    assert sol.R.loc["x", "epsilon_v"] < 0
    assert sol.R.loc["i", "epsilon_v"] > 0
    # natural-rate (demand) shock raises the gap and inflation
    assert sol.R.loc["x", "epsilon_rn"] > 0
    assert sol.R.loc["pi", "epsilon_rn"] > 0


def test_nk3_gensys_agrees(nk3):
    cr = nk3.solve_model(solver="cycle_reduction", tol=1e-14, verbose=False)
    gs = nk3.solve_model(solver="gensys", verbose=False)
    assert gs.eu == (1, 1)
    np.testing.assert_allclose(cr.T.to_numpy(), gs.T.to_numpy(), atol=1e-8)
    np.testing.assert_allclose(cr.R.to_numpy(), gs.R.to_numpy(), atol=1e-8)


def test_nk3_taylor_principle_violation(nk3):
    """phi_pi < 1 (passive policy) violates the Taylor principle ->
    indeterminacy, which gensys must detect."""
    sol = nk3.solve_model(solver="gensys", phi_pi=0.5, phi_x=0.0,
                          on_failure="ignore", verbose=False)
    assert sol.eu[1] != 1


def test_nk_full_builds_and_solves(nk_full):
    assert nk_full.n_variables == 16
    ss = nk_full.steady_state(verbose=False)
    assert ss.success and ss.resid_norm < 1e-12
    s = ss.to_string()
    # markup steady state: mc = (eps-1)/eps
    np.testing.assert_allclose(s["mc_ss"], 5.0 / 6.0, rtol=1e-12)
    np.testing.assert_allclose(s["R_ss"], 1 / 0.99, rtol=1e-12)

    sol = nk_full.solve_model(verbose=False)
    assert sol.success
    assert sol.deterministic_norm < 1e-10
    assert sol.spectral_radius < 1.0


def test_nk_full_gensys_agrees(nk_full):
    cr = nk_full.solve_model(solver="cycle_reduction", tol=1e-14, verbose=False)
    gs = nk_full.solve_model(solver="gensys", verbose=False)
    assert gs.eu == (1, 1)
    np.testing.assert_allclose(cr.T.to_numpy(), gs.T.to_numpy(), atol=1e-8)
    np.testing.assert_allclose(cr.R.to_numpy(), gs.R.to_numpy(), atol=1e-8)


def test_nk_full_irf_signs(nk_full):
    sol = nk_full.solve_model(verbose=False)
    irf = impulse_response_function(sol, periods=20, shock_size=0.01)
    # contractionary monetary shock: output, inflation fall; rate rises
    assert irf.loc[("epsilon_R", 0), "Y"] < 0
    assert irf.loc[("epsilon_R", 0), "pi"] < 0
    assert irf.loc[("epsilon_R", 0), "R"] > 0
    # technology shock: output up, inflation down (supply)
    assert irf.loc[("epsilon_A", 0), "Y"] > 0
    assert irf.loc[("epsilon_A", 0), "pi"] < 0


def test_nk_full_estimation_wiring(nk_full):
    """Statespace configures and the logpost is finite at calibration."""
    import jax

    from geconpy_tpu.stats.statespace import DSGEStateSpace

    ss = DSGEStateSpace(nk_full)
    ss.configure(
        observed_states=["Y", "pi", "R"],
        constant_params=["sigma_C", "sigma_L", "h_C", "gamma_I", "alpha",
                         "psi_p", "rho_pref", "sigma_pref"],
    )
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=80)
    extras = jax.jit(ss.build_logpost_extras(data))(ss.unconstrain(draw))
    assert np.isfinite(float(extras.logpost)), extras
    g = jax.jit(jax.grad(ss.build_logpost(data)))(ss.unconstrain(draw))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.fixture(scope="module")
def nk_sw():
    return model_from_gcn(get_example_gcn("nk_sw"), verbose=False)


def test_nk_sw_builds_and_solves(nk_sw):
    """SW-scale model: 21 variables, 6 shocks, analytic SS, both solvers."""
    assert nk_sw.n_variables == 21
    assert nk_sw.n_shocks == 6
    ss = nk_sw.steady_state(verbose=False)
    assert ss.success and ss.resid_norm < 1e-12
    s = ss.to_string()
    np.testing.assert_allclose(s["u_ss"], 1.0, atol=1e-12)
    np.testing.assert_allclose(s["G_ss"] / s["Y_ss"], 0.2, rtol=1e-10)

    cr = nk_sw.solve_model(solver="cycle_reduction", tol=1e-14, verbose=False)
    gs = nk_sw.solve_model(solver="gensys", verbose=False)
    assert cr.success and gs.success
    np.testing.assert_allclose(cr.T.to_numpy(), gs.T.to_numpy(), atol=1e-8)
    bk = nk_sw.check_bk_condition(verbose=False)
    assert bk.attrs["bk_satisfied"]


def test_nk_sw_irf_signs(nk_sw):
    sol = nk_sw.solve_model(verbose=False)
    irf = impulse_response_function(sol, periods=20, shock_size=0.01)
    # government spending crowds out consumption, raises output
    assert irf.loc[("epsilon_g", 0), "Y"] > 0
    assert irf.loc[("epsilon_g", 0), "C"] < 0
    # positive price-markup shock raises inflation, lowers output
    assert irf.loc[("epsilon_p_shock", 0), "pi"] > 0
    assert irf.loc[("epsilon_p_shock", 0), "Y"] < 0
    # utilization rises with technology-driven demand for capital services
    assert abs(irf.loc[("epsilon_A", 0), "u"]) > 0


@pytest.fixture(scope="module")
def sw2007():
    return model_from_gcn(get_example_gcn("sw2007"), verbose=False)


def test_sw2007_builds_and_solves(sw2007):
    """Faithful linearized Smets-Wouters 2007: 33 variables, 7 shocks."""
    m = sw2007
    assert m.n_variables == 33
    assert m.n_shocks == 7
    assert m.primitives.is_linear
    sol = m.solve_model(verbose=False, tol=1e-14)
    assert sol.success and sol.deterministic_norm < 1e-10
    gs = m.solve_model(solver="gensys", verbose=False)
    assert gs.eu == (1, 1)
    np.testing.assert_allclose(sol.T.to_numpy(), gs.T.to_numpy(), atol=1e-8)
    bk = m.check_bk_condition(verbose=False)
    assert bk.attrs["bk_satisfied"]


def test_sw2007_irf_signs(sw2007):
    sol = sw2007.solve_model(verbose=False)
    irf = impulse_response_function(sol, periods=20, shock_size=1.0)
    # contractionary monetary policy: output and inflation fall, rate rises
    assert irf.loc[("em", 0), "y"] < 0
    assert irf.loc[("em", 0), "pinf"] < 0
    assert irf.loc[("em", 0), "r"] > 0
    # productivity: output up, inflation down, hours fall on impact (SW's
    # famous result under sticky prices)
    assert irf.loc[("ea", 0), "y"] > 0
    assert irf.loc[("ea", 0), "pinf"] < 0
    assert irf.loc[("ea", 0), "lab"] < 0
    # government spending: output up, consumption crowded out
    assert irf.loc[("eg", 0), "y"] > 0
    assert irf.loc[("eg", 0), "c"] < 0
    # investment-technology: investment booms
    assert irf.loc[("eqs", 0), "inve"] > 0
    # wage markup: real wage up, output down (cost push)
    assert irf.loc[("ew", 0), "w"] > 0
    assert irf.loc[("ew", 1), "y"] < 0


def test_sw2007_estimation_wiring(sw2007):
    """The SW-2007 7-observable measurement block (growth rates + levels)
    produces a finite, differentiable log posterior."""
    import jax

    from geconpy_tpu.stats.statespace import DSGEStateSpace

    ss = DSGEStateSpace(sw2007)
    constant = [p for p in sw2007.param_names
                if p not in ("crhoa", "crhob", "crhog", "sigma_ea",
                             "sigma_eb", "sigma_eg", "sigma_em", "crpi",
                             "crr", "chabb")]
    ss.configure(
        observed_states=["dy", "dc", "dinve", "dw", "pinfobs", "robs",
                         "labobs"],
        observation_equations={
            "dy": "y[] - y[-1]",
            "dc": "c[] - c[-1]",
            "dinve": "inve[] - inve[-1]",
            "dw": "w[] - w[-1]",
            "pinfobs": "pinf[]",
            "robs": "r[]",
            "labobs": "lab[]",
        },
        constant_params=constant,
    )
    assert ss._obs_max_lag == 1
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=60)
    u = ss.unconstrain(draw)
    extras = jax.jit(ss.build_logpost_extras(data))(u)
    assert np.isfinite(float(extras.logpost)), extras
    g = jax.jit(jax.grad(ss.build_logpost(data)))(u)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotemberg_monetary_shock_signs():
    """Expansionary monetary shock (rate cut) raises output and inflation;
    technology shock raises output and lowers inflation."""
    import geconpy_tpu

    m = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("nk_rotemberg"),
                                   verbose=False)
    sol = m.solve_model(verbose=False)
    assert sol.success
    irf = geconpy_tpu.impulse_response_function(
        sol, periods=8, shock_size={"eps_m": 0.0025, "eps_A": 0.01})
    assert irf.loc[("eps_m", 0), "Y"] > 0
    assert irf.loc[("eps_m", 0), "pi"] > 0
    assert irf.loc[("eps_A", 0), "Y"] > 0
    assert irf.loc[("eps_A", 0), "pi"] < 0


def test_investment_adjustment_costs_hump():
    """CEE-style adjustment costs: investment builds gradually (hump) and
    Tobin's q moves above steady state on a positive technology shock; the
    frictionless RBC jumps on impact instead."""
    import geconpy_tpu
    import numpy as np

    m = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc_iac"),
                                   verbose=False)
    sol = m.solve_model(verbose=False)
    assert sol.success
    irf = geconpy_tpu.impulse_response_function(
        sol, periods=16, shock_size={"epsilon_A": 0.01})
    I_path = np.asarray(irf.xs("epsilon_A")["I"])
    assert I_path[2] > I_path[0] > 0            # hump shape
    assert abs(irf.loc[("epsilon_A", 0), "q"]) > 1e-5

    frictionless = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("rbc"), verbose=False).solve_model(
            verbose=False)
    irf0 = geconpy_tpu.impulse_response_function(
        frictionless, periods=16, shock_size={"epsilon_A": 0.01})
    I0 = np.asarray(irf0.xs("epsilon_A")["I"])
    assert I0[0] > I0[2]                        # no hump without the cost
