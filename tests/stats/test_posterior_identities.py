"""Exact identities of the posterior-functional tooling (stats/posterior.py)
on a synthetic jittered-prior 'posterior' (no MCMC needed — the identities
hold draw by draw)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.estimation import PosteriorResult
from geconpy_tpu.stats.posterior import (
    historical_shock_decomposition,
    posterior_fevd,
    posterior_girfs,
    posterior_irfs,
    posterior_predictive,
    posterior_smoothed_states,
)
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def ss_mod():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"])
    return ss


@pytest.fixture(scope="module")
def fake_result(ss_mod):
    u0 = ss_mod.initial_position()
    rng = np.random.default_rng(0)
    us = np.asarray(u0)[None, None, :] + 0.04 * rng.normal(
        size=(2, 4, len(u0)))
    constrain = jax.vmap(jax.vmap(ss_mod.constrain))
    return PosteriorResult(
        samples=np.asarray(constrain(jnp.asarray(us))),
        unconstrained=us,
        logp=np.zeros((2, 4)),
        param_names=ss_mod.param_labels,
        diverging=np.zeros((2, 4), dtype=bool),
        accept_prob=np.ones((2, 4)),
        step_size=np.full(2, 0.1),
    )


@pytest.fixture(scope="module")
def data(ss_mod):
    d, _ = ss_mod.data_from_prior(jax.random.PRNGKey(3), periods=40)
    return np.asarray(d)


def test_shock_decomposition_components_sum_to_smoothed(ss_mod, fake_result,
                                                        data):
    dec = historical_shock_decomposition(ss_mod, fake_result, data,
                                         max_draws=4)
    shock_cols = [c for c in dec.columns if c not in ("initial", "smoothed")]
    total = dec[shock_cols].sum(axis=1) + dec["initial"]
    np.testing.assert_allclose(total.to_numpy(),
                               dec["smoothed"].to_numpy(), atol=1e-8)


def test_single_draw_irf_matches_direct_solution(ss_mod, fake_result):
    """posterior_irfs with ONE draw must equal the IRF computed directly
    from that draw's policy solution (one-std shocks)."""
    u = jnp.asarray(fake_result.unconstrained[0, 0])
    single = PosteriorResult(
        samples=fake_result.samples[:1, :1],
        unconstrained=fake_result.unconstrained[:1, :1],
        logp=np.zeros((1, 1)), param_names=fake_result.param_names,
        diverging=np.zeros((1, 1), dtype=bool),
        accept_prob=np.ones((1, 1)), step_size=np.full(1, 0.1))
    out = posterior_irfs(ss_mod, single, periods=8, max_draws=1)

    solve_draw = ss_mod.build_solution_fn()
    sol = jax.jit(solve_draw)(u)
    T = np.asarray(sol["T"])
    R = np.asarray(sol["R"])
    sd = np.sqrt(np.diag(np.asarray(sol["Q"])))
    mf = ss_mod.model.functions
    for j, shock in enumerate(mf.shock_names):
        x = R[:, j] * sd[j]
        for t in range(8):
            got = out.loc[(shock, slice(None), t), "mean"].to_numpy()
            np.testing.assert_allclose(got, x, atol=1e-8,
                                       err_msg=f"{shock} t={t}")
            x = T @ x
    # with one draw the quantile bands collapse onto the mean
    np.testing.assert_allclose(out["q0.05"].to_numpy(),
                               out["mean"].to_numpy(), atol=1e-10)


def test_fevd_rows_sum_to_one(ss_mod, fake_result):
    fevd = posterior_fevd(ss_mod, fake_result, max_draws=4)
    np.testing.assert_allclose(fevd.to_numpy().sum(axis=1), 1.0, rtol=1e-8)


def test_smoothed_states_match_direct_smoother_single_draw(ss_mod,
                                                           fake_result,
                                                           data):
    from geconpy_tpu.ops.kalman import kalman_smoother

    single = PosteriorResult(
        samples=fake_result.samples[:1, :1],
        unconstrained=fake_result.unconstrained[:1, :1],
        logp=np.zeros((1, 1)), param_names=fake_result.param_names,
        diverging=np.zeros((1, 1), dtype=bool),
        accept_prob=np.ones((1, 1)), step_size=np.full(1, 0.1))
    sm = posterior_smoothed_states(ss_mod, single, data, max_draws=1)

    u = jnp.asarray(fake_result.unconstrained[0, 0])
    sol = jax.jit(ss_mod.build_solution_fn(full_state=True))(u)
    ref = kalman_smoother(jnp.asarray(data), sol["T_aug"], sol["R_aug"],
                          sol["Q"], sol["Z"], sol["H"], d=sol["d"])
    n = ss_mod.model.functions.n_variables
    # frame is (time, variable)-indexed with mean/quantile columns
    got = sm["mean"].to_numpy().reshape(data.shape[0], n)
    np.testing.assert_allclose(got, np.asarray(ref.smoothed_mean)[:, :n],
                               atol=1e-6)
    # single draw: the quantile band collapses onto the mean
    np.testing.assert_allclose(sm["q0.5"].to_numpy(), sm["mean"].to_numpy(),
                               atol=1e-10)


def test_posterior_predictive_covers_the_data(ss_mod, fake_result, data):
    pp = posterior_predictive(ss_mod, fake_result, jax.random.PRNGKey(5),
                              periods=data.shape[0], max_draws=4)
    assert np.isfinite(pp.to_numpy()).all()
    # (variable, time)-indexed bands over every observable
    assert set(pp.index.get_level_values("variable")) \
        == set(ss_mod.observed_states)
    # the generating data lie inside a generous predictive envelope
    for i, name in enumerate(ss_mod.observed_states):
        lo = pp.loc[name, "q0.05"].to_numpy().min()
        hi = pp.loc[name, "q0.95"].to_numpy().max()
        spread = hi - lo
        assert data[:, i].min() > lo - 3 * spread
        assert data[:, i].max() < hi + 3 * spread


def test_girf_of_zero_shock_is_zero(ss_mod, fake_result):
    shock = ss_mod.model.functions.shock_names[0]
    g = posterior_girfs(ss_mod, fake_result, shock, jax.random.PRNGKey(9),
                        shock_size=0.0, periods=6, max_draws=2, n_mc=8)
    np.testing.assert_allclose(g["mean"].to_numpy(), 0.0, atol=1e-7)
