"""DSGE-VAR (stats/dsge_var.py).

Three independent anchors: the NIW marginal-likelihood formula against
direct numerical integration (scalar case), the DSGE-implied VAR moments
against long-simulation sample moments, and the lambda profile preferring
the DSGE restrictions on model-generated data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.dsge_var import (
    dsge_var_lambda_profile,
    dsge_var_marginal_likelihood,
    dsge_var_moments,
    niw_log_marginal,
)
from geconpy_tpu.stats.statespace import DSGEStateSpace


def test_niw_marginal_against_quadrature():
    """Scalar VAR(0) (intercept only): integrate the likelihood against
    the normal-inverse-gamma prior by quadrature and compare."""
    from scipy import integrate, stats

    rng = np.random.default_rng(0)
    T = 12
    Y = rng.normal(0.3, 0.8, size=(T, 1))
    X = np.ones((T, 1))
    lam = 2.0
    gxx, gxy, gyy = 1.0, 0.25, 1.3          # implied phi* = 0.25
    lt = lam * T
    nu0 = lt - 1
    S0 = lt * (gyy - gxy**2 / gxx)
    P0 = lt * gxx

    # marginalize phi analytically: Y | s2 ~ N(X phi*, s2 (I + X X'/P0))
    M = np.eye(T) + np.outer(X, X) / P0
    resid = Y[:, 0] - X[:, 0] * (gxy / gxx)
    Minv_r = np.linalg.solve(M, resid)
    _, ldM = np.linalg.slogdet(M)

    def integrand(s2):
        loglik = (-0.5 * T * np.log(2 * np.pi * s2) - 0.5 * ldM
                  - 0.5 * resid @ Minv_r / s2)
        logprior = stats.invgamma.logpdf(s2, nu0 / 2.0, scale=S0 / 2.0)
        return np.exp(loglik + logprior)

    val, err = integrate.quad(integrand, 1e-6, 60.0, limit=400)
    expected = np.log(val)

    got = float(niw_log_marginal(
        jnp.asarray([[gxx]]), jnp.asarray([[gxy]]), jnp.asarray([[gyy]]),
        jnp.asarray(X.T @ X), jnp.asarray(X.T @ Y), jnp.asarray(Y.T @ Y),
        T=T, lam=lam))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.fixture(scope="module")
def setup():
    model = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["x", "pi"], filter_type="sequential")
    return ss


def test_implied_moments_match_simulation(setup):
    ss = setup
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=60000,
                                    params={})
    u = ss.unconstrain(draw)
    sol = jax.jit(ss.build_solution_fn(full_state=True))(jnp.asarray(u))
    p = 2
    Gxx, Gxy, Gyy = dsge_var_moments(sol, p)

    y = np.asarray(data)
    from geconpy_tpu.stats.dsge_var import _stack_var_data

    X, Y = _stack_var_data(y, p)
    Te = len(Y)
    np.testing.assert_allclose(X.T @ X / Te, np.asarray(Gxx),
                               atol=0.05 * float(np.abs(Gxx).max()))
    np.testing.assert_allclose(X.T @ Y / Te, np.asarray(Gxy),
                               atol=0.05 * float(np.abs(Gxx).max()))
    np.testing.assert_allclose(Y.T @ Y / Te, np.asarray(Gyy),
                               atol=0.05 * float(np.abs(Gyy).max()))


def test_lambda_profile_prefers_dsge_on_model_data(setup):
    ss = setup
    data, draw = ss.data_from_prior(jax.random.PRNGKey(1), periods=300,
                                    params={})
    prof = dsge_var_lambda_profile(ss, np.asarray(data), p=2,
                                   u=ss.unconstrain(draw),
                                   lambdas=[0.25, 0.5, 1.0, 5.0, 50.0])
    # correctly specified: the data prefer heavy weight on the restrictions
    assert prof["log_ml"].idxmax() >= 5.0
    assert np.isfinite(prof["log_ml"]).all()
    # lambda below the properness bound raises
    with pytest.raises(ValueError, match="lambda too small"):
        dsge_var_marginal_likelihood(ss, np.asarray(data), lam=0.001, p=2)
