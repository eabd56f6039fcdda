"""Gradient path for the Pallas batched kernels.

The differentiable batched log-posterior (Pallas forward, analytic
implicit-adjoint backward) must agree with the XLA autodiff path
(``build_logpost``) in both value and gradient — f64 CPU, interpret-mode
kernels.  Role parity target: the reference's policy adjoint
(``gEconpy/solvers/shared.py:12``) is what makes its estimation fast; here
it is what lets NUTS run on the sweep kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace


def _setup(model_name, observed, constant=(), filter_type="steady_state",
           periods=48):
    model = model_from_gcn(get_example_gcn(model_name), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=observed, constant_params=list(constant),
                 filter_type=filter_type, kalman_settle=12)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(3), periods=periods)
    u0 = ss.unconstrain(draw)
    return ss, np.asarray(data), jnp.asarray(u0)


@pytest.mark.parametrize("model_name,observed,constant", [
    ("rbc_estimation", ["Y"], ["alpha", "sigma_C"]),
    ("nk_3eq", ["x", "pi"], []),
])
def test_batched_logpost_grad_matches_xla(model_name, observed, constant):
    ss, data, u0 = _setup(model_name, observed, constant)

    batch = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), (6, u0.shape[0]), dtype=u0.dtype)

    vag = jax.jit(ss.build_batched_logpost_and_grad(data, interpret=True,
                                                    cr_tile=8))
    vals_p, grads_p = vag(batch)

    logpost = ss.build_logpost(data)
    vals_x, grads_x = jax.jit(
        jax.vmap(jax.value_and_grad(logpost)))(batch)
    grads_x = jnp.where(jnp.isfinite(grads_x), grads_x, 0.0)

    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_x),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(grads_p), np.asarray(grads_x),
                               rtol=1e-6, atol=1e-6)


def test_batched_logpost_rejects_bad_draw_with_zero_grad():
    ss, data, u0 = _setup("rbc_estimation", ["Y"], ["alpha", "sigma_C"])
    batch = jnp.stack([u0, jnp.full_like(u0, 40.0)])  # 2nd draw: absurd
    vag = jax.jit(ss.build_batched_logpost_and_grad(data, interpret=True,
                                                    cr_tile=8))
    vals, grads = vag(batch)
    assert np.isfinite(np.asarray(vals[0]))
    assert not np.isfinite(np.asarray(vals[1]))  # rejected draw -> -inf
    assert np.all(np.isfinite(np.asarray(grads)))  # bad rows zeroed
    assert np.all(np.asarray(grads[1]) == 0.0)


def test_nuts_runs_on_pallas_logp_grad():
    """A few NUTS transitions driven by the custom_vmap'd batched
    value+grad must move the chains and stay finite."""
    from geconpy_tpu.stats.estimation import make_batched_logp_grad
    from geconpy_tpu.stats.nuts import sample_nuts

    ss, data, u0 = _setup("rbc_estimation", ["Y"], ["alpha", "sigma_C"],
                          periods=32)
    logpost = ss.build_logpost(data)
    lg = make_batched_logp_grad(ss, data, interpret=True, cr_tile=8)

    inits = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (4, u0.shape[0]), dtype=u0.dtype)
    res = sample_nuts(logpost, inits, jax.random.PRNGKey(1),
                      num_warmup=10, num_samples=10, max_depth=4,
                      logp_grad_fn=lg)
    assert np.isfinite(np.asarray(res.logp)).all()
    assert np.asarray(res.accept_prob).mean() > 0.2
    # chains actually moved
    assert float(np.abs(np.asarray(res.samples[:, -1]) -
                        np.asarray(inits)).max()) > 1e-4


def test_stationary_pallas_settle_matches_xla_settle():
    """settle='pallas' (lane-batched DARE kernel, primal-only) must agree
    with the default XLA Hewer settle in value and gradient — the implicit
    DARE adjoint re-attaches at whichever fixed point the settle produced."""
    ss, data, u0 = _setup("rbc_estimation", ["Y"], ["alpha", "sigma_C"],
                          filter_type="stationary")
    batch = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), (4, u0.shape[0]), dtype=u0.dtype)

    vag_x = jax.jit(ss.build_batched_logpost_and_grad(
        data, interpret=True, cr_tile=8, settle="xla"))
    vag_p = jax.jit(ss.build_batched_logpost_and_grad(
        data, interpret=True, cr_tile=8, settle="pallas"))
    vx, gx = vag_x(batch)
    vp, gp = vag_p(batch)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-6, atol=1e-6)
