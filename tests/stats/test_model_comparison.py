"""Marginal-likelihood estimator tests (stats/model_comparison.py).

Both estimators must recover a KNOWN log evidence exactly on a Gaussian
"posterior": if logpost(u) = log N(u; mu, S) + logZ, the marginal
likelihood is logZ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.stats.model_comparison import (
    find_map,
    laplace_evidence,
    marginal_likelihood,
    modified_harmonic_mean,
)

_LOG2PI = 1.8378770664093453


@pytest.fixture
def gaussian_problem():
    rng = np.random.default_rng(0)
    d = 4
    mu = jnp.asarray(rng.normal(size=d))
    A = rng.normal(size=(d, d))
    S = jnp.asarray(A @ A.T + np.eye(d))
    Sinv = jnp.linalg.inv(S)
    _, logdetS = jnp.linalg.slogdet(S)
    logZ = -3.7

    def logpost(u):
        delta = u - mu
        return (-0.5 * (d * _LOG2PI + logdetS + delta @ Sinv @ delta)
                + logZ)

    return logpost, mu, S, logZ, d


def test_find_map_reaches_gaussian_mode(gaussian_problem):
    logpost, mu, S, logZ, d = gaussian_problem
    u0 = mu + 2.5
    u_mode = find_map(logpost, u0)
    np.testing.assert_allclose(np.asarray(u_mode), np.asarray(mu), atol=1e-8)


def test_laplace_exact_on_gaussian(gaussian_problem):
    logpost, mu, S, logZ, d = gaussian_problem
    u_mode = find_map(logpost, mu + 1.0)
    ml = laplace_evidence(logpost, u_mode)
    np.testing.assert_allclose(ml, logZ, atol=1e-8)


def test_harmonic_mean_recovers_gaussian_evidence(gaussian_problem):
    logpost, mu, S, logZ, d = gaussian_problem
    rng = np.random.default_rng(3)
    draws = rng.multivariate_normal(np.asarray(mu), np.asarray(S),
                                    size=20_000)
    lp = np.asarray(jax.vmap(logpost)(jnp.asarray(draws)))
    ml = modified_harmonic_mean(draws, lp, tau=0.5)
    np.testing.assert_allclose(ml, logZ, atol=0.02)


def test_harmonic_mean_chain_shaped_input(gaussian_problem):
    logpost, mu, S, logZ, d = gaussian_problem
    rng = np.random.default_rng(5)
    draws = rng.multivariate_normal(np.asarray(mu), np.asarray(S),
                                    size=8_000).reshape(4, 2_000, d)
    lp = np.asarray(jax.vmap(jax.vmap(logpost))(jnp.asarray(draws)))
    ml = modified_harmonic_mean(draws, lp)
    np.testing.assert_allclose(ml, logZ, atol=0.05)


def test_laplace_on_dsge_model():
    """End to end on a real model: the Laplace evidence at the MAP is finite
    and close to the logpost at the mode (d/2 log 2pi - 1/2 log|H| is a
    modest correction for a well-identified model)."""
    import geconpy_tpu
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], constant_params=["alpha", "sigma_C"],
                 measurement_error={"Y": 0.001})
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=80)

    ml = marginal_likelihood(ss, np.asarray(data), method="laplace",
                             adam_steps=300)
    assert np.isfinite(ml)

    # the mode's logpost upper-bounds the evidence contribution pattern:
    # |ml - logpost(mode)| should be a moderate dimensional correction
    logpost = jax.jit(ss.build_logpost(np.asarray(data)))
    u_mode = find_map(logpost, ss.initial_position(), adam_steps=300)
    gap = abs(ml - float(logpost(u_mode)))
    assert gap < 30.0, (ml, float(logpost(u_mode)))


def test_method_validation():
    with pytest.raises(ValueError, match="requires a fit"):
        marginal_likelihood(_DummySS(), np.zeros((5, 1)), method="harmonic")
    with pytest.raises(ValueError, match="method must be"):
        marginal_likelihood(_DummySS(), np.zeros((5, 1)), method="bridge")


class _DummySS:
    def build_logpost(self, data):
        return lambda u: -0.5 * jnp.sum(u**2)


def test_hessian_fd_fallback_on_custom_vjp_graph():
    """Logposts whose graph rejects forward mode (any custom_vjp — e.g. the
    cyclostationary filter) must still get MAP + Laplace, via central
    differences of the exact reverse-mode gradient."""
    from geconpy_tpu.stats.model_comparison import neg_hessian_fn

    d = 3
    mu = jnp.asarray([0.3, -0.7, 1.1])
    prec = jnp.asarray([1.0, 4.0, 0.25])
    logZ = -2.5

    @jax.custom_vjp
    def quad(u):
        return -0.5 * jnp.sum(prec * (u - mu) ** 2)

    def _fwd(u):
        return quad(u), u

    def _bwd(u, g):
        return (-g * prec * (u - mu),)

    quad.defvjp(_fwd, _bwd)

    _, logdet = jnp.linalg.slogdet(jnp.diag(prec))

    def logpost(u):
        return quad(u) - 0.5 * (d * _LOG2PI - logdet) + logZ

    with pytest.raises(TypeError):
        jax.hessian(logpost)(mu)  # precondition: fwd mode really is blocked

    H = neg_hessian_fn(logpost, mu)(mu + 0.5)
    np.testing.assert_allclose(np.asarray(H), np.diag(np.asarray(prec)),
                               rtol=1e-6, atol=1e-7)

    u_mode = find_map(logpost, mu + 1.5)
    np.testing.assert_allclose(np.asarray(u_mode), np.asarray(mu), atol=1e-6)
    ml = laplace_evidence(logpost, u_mode)
    np.testing.assert_allclose(ml, logZ, atol=1e-6)


def test_compare_models_table():
    """Evidence table: the generating specification wins against a
    restricted (rho_A frozen at the wrong value) alternative."""
    from geconpy_tpu import get_example_gcn, model_from_gcn
    from geconpy_tpu.stats.model_comparison import compare_models
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    gcn = get_example_gcn("rbc_estimation")
    full = model_from_gcn(gcn, verbose=False)
    ss = DSGEStateSpace(full)
    ss.configure(observed_states=["Y"],
                 constant_params=["alpha", "sigma_C"],
                 measurement_error={"Y": 0.005})
    data, _ = ss.data_from_prior(jax.random.PRNGKey(2), periods=150,
                                 params={"rho_A": 0.85, "sigma_A": 0.012})
    data = np.asarray(data)

    wrong = model_from_gcn(gcn, verbose=False)
    ss_wrong = DSGEStateSpace(wrong)
    ss_wrong.configure(observed_states=["Y"],
                       measurement_error={"Y": 0.005},
                       constant_params=["alpha", "sigma_C", "rho_A"])
    # freeze rho_A at the default (0.95) while the data used 0.85: fewer
    # parameters but misspecified — evidence should prefer the full model
    tab = compare_models({"full": ss, "restricted": ss_wrong}, data,
                         adam_steps=300)
    assert list(tab.columns) == ["log_ml", "log_bayes_factor",
                                 "posterior_prob"]
    assert tab.index[0] == "full"
    assert tab.loc["full", "posterior_prob"] > 0.5
    assert np.isclose(tab["posterior_prob"].sum(), 1.0)

    with pytest.raises(ValueError, match="keys must match"):
        compare_models({"full": ss}, data, prior_probs={"other": 1.0})
