"""Second-order (pruned) estimation path: UKF/PF likelihoods wired through
DSGEStateSpace (stats/nonlinear.py).

Oracles:
- Brock-Mirman is exactly linear in logs (every second-order block
  vanishes), so the second-order UKF log-likelihood must equal the linear
  Kalman log-likelihood.
- On a genuinely nonlinear model (RBC in levels), the particle filter's
  unbiased estimate must agree with the UKF within its Gaussian
  approximation + MC error.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def bm_ss():
    model = model_from_gcn(str(DATA / "brock_mirman.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], shock_std=0.01)
    return ss


@pytest.fixture(scope="module")
def rbc_ss():
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"])
    return ss


@pytest.fixture(scope="module")
def rbc_dataset(rbc_ss):
    data, draw = rbc_ss.data_from_prior(jax.random.PRNGKey(11), periods=100)
    return data, draw


def test_second_order_ukf_equals_kalman_on_loglinear_model(bm_ss):
    """Brock-Mirman in logs: G_xx = G_xu = G_uu = g_ss = 0, so the pruned
    second-order system IS the linear system and the UKF must reproduce the
    Kalman log posterior exactly."""
    data, _draw = bm_ss.data_from_prior(jax.random.PRNGKey(3), periods=80)
    u = jnp.zeros((bm_ss.n_estimated,))
    lp1 = float(jax.jit(bm_ss.build_logpost(data))(u))
    lp2 = float(jax.jit(bm_ss.build_logpost_second_order(data))(u))
    assert np.isfinite(lp1)
    np.testing.assert_allclose(lp2, lp1, rtol=1e-6)


def test_second_order_solution_fn_blocks(rbc_ss, rbc_dataset):
    _data, draw = rbc_dataset
    u = rbc_ss.unconstrain(draw)
    sol = rbc_ss.build_second_order_solution_fn()(u)
    assert bool(sol["so_success"])
    n = rbc_ss.model.functions.n_variables
    assert sol["G_xx"].shape == (n, n, n)
    # RBC in logs is NOT linear: curvature must be present
    assert float(jnp.max(jnp.abs(sol["G_xx"]))) > 1e-4
    # stationary init is PSD and finite
    evals = np.linalg.eigvalsh(np.asarray(sol["P0"]))
    assert np.all(np.isfinite(evals)) and evals.min() > -1e-10


def test_second_order_logpost_finite_and_differentiable(rbc_ss, rbc_dataset):
    data, draw = rbc_dataset
    u = rbc_ss.unconstrain(draw)
    logpost = jax.jit(rbc_ss.build_logpost_second_order(data))
    lp = float(logpost(u))
    assert np.isfinite(lp)
    g = np.asarray(jax.jit(jax.grad(rbc_ss.build_logpost_second_order(data)))(u))
    assert np.all(np.isfinite(g))
    # gradient matches finite differences (the whole pipeline — SS, policy,
    # second-order Sylvester, UKF — is differentiated)
    lp_fn = logpost
    eps = 1e-6
    for i in range(len(u)):
        fd = (float(lp_fn(u.at[i].add(eps))) -
              float(lp_fn(u.at[i].add(-eps)))) / (2 * eps)
        assert abs(g[i] - fd) < 2e-3 * max(1.0, abs(fd)), \
            f"param {rbc_ss.param_labels[i]}: {g[i]} vs {fd}"


def test_second_order_ukf_close_to_kalman_on_mild_nonlinearity(rbc_ss,
                                                               rbc_dataset):
    """RBC curvature is mild at sigma ~ 1%: the second-order loglik should be
    near (but not identical to) the linear one."""
    data, draw = rbc_dataset
    u = rbc_ss.unconstrain(draw)
    lp1 = float(jax.jit(rbc_ss.build_logpost(data))(u))
    lp2 = float(jax.jit(rbc_ss.build_logpost_second_order(data))(u))
    assert np.isfinite(lp1) and np.isfinite(lp2)
    assert abs(lp2 - lp1) < 0.05 * abs(lp1) + 5.0


def test_particle_filter_agrees_with_ukf(rbc_ss, rbc_dataset):
    data, draw = rbc_dataset
    u = rbc_ss.unconstrain(draw)
    lp_ukf = float(jax.jit(rbc_ss.build_logpost_second_order(data))(u))
    pf = jax.jit(rbc_ss.build_pf_loglik_second_order(data, n_particles=8192))
    lls = []
    for seed in range(3):
        ll, ok = pf(u, jax.random.PRNGKey(seed))
        assert bool(ok)
        lls.append(float(ll))
    # remove the prior to compare likelihoods
    sol = rbc_ss.build_second_order_solution_fn()(u)
    ll_ukf = lp_ukf - float(sol["logprior"])
    assert abs(np.mean(lls) - ll_ukf) < 3.0, (lls, ll_ukf)


def test_second_order_with_observation_equation_lags(bm_ss):
    """Growth observables (lag chain) at second order: on the log-linear
    Brock-Mirman the result must again match the linear filter."""
    model = bm_ss.model
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["dY"], shock_std=0.01,
                 observation_equations={"dY": "Y[] - Y[-1]"})
    data, _ = ss.data_from_prior(jax.random.PRNGKey(5), periods=60)
    u = jnp.zeros((ss.n_estimated,))
    lp1 = float(jax.jit(ss.build_logpost(data))(u))
    lp2 = float(jax.jit(ss.build_logpost_second_order(data))(u))
    assert np.isfinite(lp1)
    np.testing.assert_allclose(lp2, lp1, rtol=1e-5)


def test_fit_order2_nuts_smoke():
    """End-to-end: NUTS on the unscented second-order posterior (fit with
    order=2).  Two parameters free, short chain — a smoke test that the
    whole differentiable pipeline (SS -> policy -> quadratic Sylvester ->
    pruned UKF) samples without divergence blow-ups."""
    from geconpy_tpu.stats.estimation import fit

    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"],
                 constant_params=["alpha", "sigma_C"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(21), periods=50)
    res = fit(ss, data, num_chains=2, num_warmup=80, num_samples=80,
              seed=1, order=2, pooled_adaptation=True, max_depth=5)
    assert np.isfinite(np.asarray(res.logp)).all()
    assert float(np.asarray(res.diverging).mean()) < 0.25
    # chains moved and produced usable draws
    for name in ("rho_A", "sigma_A"):
        j = res.param_names.index(name)
        draws = np.asarray(res.samples[..., j])
        assert np.isfinite(draws).all()
        assert draws.std() > 0


def test_fit_order2_rejects_pallas():
    from geconpy_tpu.stats.estimation import fit

    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], measurement_error=["Y"])
    with pytest.raises(ValueError, match="order=2"):
        fit(ss, np.zeros((10, 1)), order=2, policy="pallas")


def test_second_order_logpost_gates_bad_draw(rbc_ss, rbc_dataset):
    """A wildly unreasonable draw (explosive/failed solve) must give -inf,
    not raise or return NaN."""
    data, _ = rbc_dataset
    logpost = jax.jit(rbc_ss.build_logpost_second_order(data))
    u_bad = jnp.full((rbc_ss.n_estimated,), 40.0)
    lp = float(logpost(u_bad))
    assert lp == -np.inf or np.isfinite(lp)
    assert not np.isnan(lp)


def test_filter_data_second_order(rbc_ss, rbc_dataset):
    """Smoothed/filtered second-order state paths: labeled, finite, loglik
    consistent with the logpost path, and the y1+y2 split exposed."""
    from geconpy_tpu.stats.nonlinear import filter_data_second_order

    data, draw = rbc_dataset
    df = filter_data_second_order(rbc_ss, data, params=draw, smoother=True)
    assert list(df.columns) == rbc_ss.model.functions.variable_names
    assert np.isfinite(df.to_numpy()).all()
    assert np.isfinite(df.attrs["loglik"])
    np.testing.assert_allclose(df.to_numpy(),
                               df.attrs["y1"] + df.attrs["y2"])
    # the smoother's forward pass is the UKF: its loglik must equal the
    # logpost path minus the prior
    u = rbc_ss.unconstrain(draw)
    lp = float(jax.jit(rbc_ss.build_logpost_second_order(data))(u))
    sol = rbc_ss.build_second_order_solution_fn()(u)
    np.testing.assert_allclose(df.attrs["loglik"],
                               lp - float(sol["logprior"]), rtol=1e-8)


def test_marginalized_matches_full_ukf(rbc_ss, rbc_dataset):
    """The Rao-Blackwellized filter and the generic augmented-state UKF are
    different sigma-point constructions of the same second-order-accurate
    approximation: on mild RBC curvature they must agree tightly (and both
    equal the Kalman filter exactly on linear models — see the Brock-Mirman
    oracle above, which runs the marginalized path)."""
    data, draw = rbc_dataset
    u = rbc_ss.unconstrain(draw)
    lp_m = float(jax.jit(
        rbc_ss.build_logpost_second_order(data, method="marginalized"))(u))
    lp_f = float(jax.jit(
        rbc_ss.build_logpost_second_order(data, method="full"))(u))
    assert np.isfinite(lp_m) and np.isfinite(lp_f)
    np.testing.assert_allclose(lp_m, lp_f, rtol=1e-4)


@pytest.mark.parametrize("method", ["marginalized", "full"])
def test_remat_matches_stored_value_and_grad(rbc_ss, rbc_dataset, method):
    """jax.checkpoint on the filter scan body must be a pure memory/compute
    trade: value and gradient identical to the stored-intermediates path."""
    data, draw = rbc_dataset
    u = rbc_ss.unconstrain(draw)
    vg_r = jax.jit(jax.value_and_grad(
        rbc_ss.build_logpost_second_order(data, method=method, remat=True)))
    vg_s = jax.jit(jax.value_and_grad(
        rbc_ss.build_logpost_second_order(data, method=method, remat=False)))
    v_r, g_r = vg_r(u)
    v_s, g_s = vg_s(u)
    np.testing.assert_allclose(float(v_r), float(v_s), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_s),
                               rtol=1e-7, atol=1e-9)
