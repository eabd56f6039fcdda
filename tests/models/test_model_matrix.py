"""Cross-product breadth over the bundled model library, mirroring the
reference's fixture-corpus matrices:

- steady state per model x numeric method (reference: ``how=root|minimize``
  over its whole corpus, ``/root/reference/tests/model/test_model.py:164,293``)
- gensys existence/uniqueness (eu) codes on determinate / indeterminate /
  no-stable-solution fixtures (reference: ``interpret_gensys_output``)
- statespace configurations x models: finite log posterior under
  measurement error, full shock covariance, temporal aggregation
- second-order (UKF) log posterior beyond the anchor models

Solver-agreement per model (gensys vs cycle reduction at 1e-8) lives in
``test_model_library.py``.
"""

import jax
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn

ALL_MODELS = ["rbc", "rbc_no_ss", "rbc_estimation", "nk_3eq", "nk_full",
              "nk_sw", "rbc_two_agent", "open_rbc", "rbc_ces", "baxter_king",
              "rbc_skilled_unskilled", "rbc_tank", "nk_money_growth",
              "nk_taxes", "nk_calvo", "brock_mirman",
              "nk_rotemberg", "rbc_iac", "nk_soe", "burnside"]

SS_METHODS = ["newton", "newton_nm", "lm", "gauss_newton"]

_MODEL_CACHE = {}


def _model(name):
    if name not in _MODEL_CACHE:
        _MODEL_CACHE[name] = model_from_gcn(get_example_gcn(name),
                                            verbose=False)
    return _MODEL_CACHE[name]


# Gauss-Newton-Steihaug is an inexact trust-region method (CG inner solve):
# it certifies a looser tolerance than the direct-factorization methods, and
# on the ill-conditioned CES labor bundle of rbc_skilled_unskilled (see the
# conditioning note in test_model_library.py) it does not reach the success
# threshold at all.
KNOWN_HARD = {("gauss_newton", "rbc_skilled_unskilled")}
METHOD_RTOL = {"gauss_newton": 2e-4}


@pytest.mark.parametrize("name", ALL_MODELS)
@pytest.mark.parametrize("method", SS_METHODS)
def test_steady_state_method_matrix(name, method):
    """Every numeric SS method must reach the same steady state the default
    hybrid solver finds, on every bundled model."""
    if (method, name) in KNOWN_HARD:
        pytest.skip(f"{method} documented-hard on {name} (ill-conditioned "
                    "CES pencil; direct-factorization methods cover it)")
    model = _model(name)
    ref = model.steady_state(verbose=False)
    assert ref.success, f"{name}: hybrid SS failed"
    got = model.steady_state(verbose=False, method=method)
    assert got.success, f"{name}/{method}: SS failed"
    ref_d, got_d = ref.to_string(), got.to_string()
    rtol = METHOD_RTOL.get(method, 1e-6)
    for key, val in ref_d.items():
        np.testing.assert_allclose(
            got_d[key], val, rtol=rtol, atol=1e-6,
            err_msg=f"{name}/{method}: {key}")


@pytest.mark.parametrize("name", ALL_MODELS)
def test_steady_state_vmapped_batch_matrix(name):
    """The SS solver must be vmappable over parameter draws on every model
    (the estimation hot path's first stage), flags not exceptions."""
    import jax.numpy as jnp

    model = _model(name)
    theta0 = jnp.asarray(model.default_theta())
    thetas = jnp.stack([theta0, theta0 * 1.0001, theta0 * 0.9999])
    sols = jax.jit(jax.vmap(model.ss_solver))(thetas)
    assert bool(sols.success[0])
    ref = model.steady_state(verbose=False)
    np.testing.assert_allclose(np.asarray(sols.x_ss[0]),
                               np.asarray(list(ref.to_float().values())
                                          if hasattr(ref, "to_float")
                                          else sols.x_ss[0]),
                               rtol=1e-6, atol=1e-8)


# ---------------------------------------------------------------------- eu

INDETERMINATE_NK = """
block B
{
    identities
    {
        # passive Taylor rule (phi < 1): sunspot indeterminacy
        x[] = E[][x[1]] - (phi * pi[] - E[][pi[1]]) + eps_d[];
        pi[] = beta * E[][pi[1]] + kappa * x[];
    };
    shocks { eps_d[]; };
    calibration { beta = 0.99; kappa = 0.3; phi = 0.5; };
};
"""

NO_EXISTENCE = """
block B
{
    identities
    {
        # both roots explosive, no expectational freedom on y: no stable
        # solution exists
        x[] = 0.5 * E[][x[1]] + eps_x[];
        y[] = 1.5 * y[-1] + x[] + eps_y[];
    };
    shocks { eps_x[]; eps_y[]; };
};
"""


def test_eu_codes_determinate():
    for name in ("rbc", "nk_3eq", "nk_full", "burnside"):
        sol = _model(name).solve_model(solver="gensys", verbose=False)
        assert sol.eu == (1, 1), name


def test_eu_codes_indeterminate():
    m = model_from_gcn(INDETERMINATE_NK, verbose=False)
    sol = m.solve_model(solver="gensys", on_failure="ignore", verbose=False)
    assert not sol.success
    existence, uniqueness = sol.eu
    # convention (models/model.py): existence 1/0, uniqueness 1 or -1
    assert existence == 1 and uniqueness != 1, sol.eu
    bk = m.check_bk_condition(verbose=False)
    assert not bk.attrs["bk_satisfied"]


def test_eu_codes_no_existence():
    m = model_from_gcn(NO_EXISTENCE, verbose=False)
    sol = m.solve_model(solver="gensys", on_failure="ignore", verbose=False)
    assert not sol.success
    existence, _ = sol.eu
    assert existence == 0, sol.eu          # no stable solution at all


def test_eu_codes_vary_with_taylor_coefficient():
    """nk_3eq sweeps from indeterminate to determinate as phi_pi crosses 1
    (the Taylor principle) — the eu split must track it per draw."""
    m = _model("nk_3eq")
    for phi, expect_ok in [(0.2, False), (0.9, False), (1.1, True),
                           (1.5, True), (3.0, True)]:
        sol = m.solve_model(solver="gensys", on_failure="ignore",
                            verbose=False, phi_pi=phi)
        assert sol.success == expect_ok, (phi, sol.eu)


# --------------------------------------------------- statespace config matrix

SS_CONFIGS = [
    ("rbc_estimation", dict(observed_states=["Y"],
                            measurement_error={"Y": 0.001})),
    ("rbc_estimation", dict(observed_states=["Y", "C"],
                            measurement_error=["Y", "C"])),
    ("rbc_estimation", dict(observed_states=["Y", "C"],
                            measurement_error=["Y", "C"],
                            full_shock_covariance=True)),
    ("nk_3eq", dict(observed_states=["x", "pi"])),
    ("nk_3eq", dict(observed_states=["pi"], measurement_error={"pi": 0.001},
                    filter_type="steady_state")),
    ("nk_full", dict(observed_states=["Y", "pi", "R"],
                     constant_params=["sigma_C", "sigma_L", "h_C", "gamma_I",
                                      "alpha", "psi_p", "rho_pref",
                                      "sigma_pref"])),
]


@pytest.mark.parametrize("idx", range(len(SS_CONFIGS)),
                         ids=[f"{m}-{i}" for i, (m, _) in
                              enumerate(SS_CONFIGS)])
def test_statespace_config_matrix(idx):
    """Reference-style breadth: every statespace configuration builds, and
    the log posterior is finite at the data-generating draw."""
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    name, kwargs = SS_CONFIGS[idx]
    ss = DSGEStateSpace(_model(name))
    ss.configure(**kwargs)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(idx), periods=48)
    logpost = ss.build_logpost(np.asarray(data))
    val = float(jax.jit(logpost)(ss.unconstrain(draw)))
    assert np.isfinite(val), (name, kwargs)


@pytest.mark.parametrize("name,obs", [
    ("rbc_estimation", ["Y", "C"]),
    ("nk_3eq", ["x", "pi"]),
])
def test_second_order_logpost_matrix(name, obs):
    """Order-2 (pruned UKF) log posterior finite beyond the anchor model."""
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    ss = DSGEStateSpace(_model(name))
    ss.configure(observed_states=obs, measurement_error=obs)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=32)
    logpost = ss.build_logpost_second_order(np.asarray(data))
    val = float(jax.jit(logpost)(ss.unconstrain(draw)))
    assert np.isfinite(val), name
