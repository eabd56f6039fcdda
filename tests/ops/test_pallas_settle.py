"""Interpret-mode parity for the Pallas Kalman settle kernel."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import geconpy_tpu
from geconpy_tpu.stats.statespace import DSGEStateSpace
from geconpy_tpu.ops.kalman import steady_state_filter_parts
from geconpy_tpu.ops.pallas_settle import pallas_settle_parts


@pytest.fixture(scope="module")
def sw_solutions():
    estimated = ["crhoa", "sigma_ea", "crr", "crpi", "chabb"]
    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("sw2007"),
                                       verbose=False)
    constant = [p for p in model.param_names if p not in estimated]
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["y", "c", "pinf", "r"],
                 filter_type="steady_state", kalman_settle=16,
                 constant_params=constant)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=40)
    u0 = ss.unconstrain(draw)
    U = u0[None] + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                            (4, len(u0)))
    sol = jax.jit(jax.vmap(ss.build_solution_fn()))(U)
    return ss, sol, jnp.asarray(np.asarray(data)[:16]), np.asarray(data), U


def test_settle_parts_parity(sw_solutions):
    _ss, sol, y_head, _data, _U = sw_solutions
    T, R, Q, Z, H, d = (sol["T_aug"], sol["R_aug"], sol["Q"], sol["Z"],
                        sol["H"], sol["d"])
    RQR = jax.vmap(lambda r, q: r @ q @ r.T)(R, Q)
    ref = jax.vmap(lambda t, r, q, z, h, dd: steady_state_filter_parts(
        y_head, t, r, q, z, h, d=dd))(T, R, Q, Z, H, d)
    pal = pallas_settle_parts(y_head, T, RQR, Z, H, d, tile=4,
                              interpret=True)
    for name, a, b in zip(["ll_head", "x_pred0", "M", "TK", "Finv", "const"],
                          ref, pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-8,
                                   err_msg=name)


def test_batched_loglik_pallas_settle_parity(sw_solutions):
    """Full pipeline with policy='pallas', settle='pallas' matches the
    vmapped XLA logpost."""
    ss, _sol, _y, data, U = sw_solutions
    f_pal = jax.jit(ss.build_batched_loglik(
        data, n_settle=16, policy="pallas", settle="pallas", cr_tile=4,
        interpret=True))
    lp_ref = jax.jit(jax.vmap(ss.build_logpost(data)))
    ll_p = np.asarray(f_pal(U))
    ll_r = np.asarray(lp_ref(U))
    both = np.isfinite(ll_p) & np.isfinite(ll_r)
    assert both.sum() >= 3
    np.testing.assert_allclose(ll_p[both], ll_r[both], rtol=1e-8)


def test_fused_settle_filter_loglik(sw_solutions):
    """The single-kernel settle+tail loglik matches the XLA
    steady-state filter exactly."""
    from geconpy_tpu.ops.kalman import steady_state_kalman_loglik
    from geconpy_tpu.ops.pallas_settle import pallas_settle_filter_loglik

    _ss, sol, _y_head, data, _U = sw_solutions
    T, R, Q, Z, H, d = (sol["T_aug"], sol["R_aug"], sol["Q"], sol["Z"],
                        sol["H"], sol["d"])
    RQR = jax.vmap(lambda r, q: r @ q @ r.T)(R, Q)
    y = jnp.asarray(data)
    ref = jax.vmap(lambda t, r, q, z, h, dd: steady_state_kalman_loglik(
        y, t, r, q, z, h, d=dd, n_settle=16))(T, R, Q, Z, H, d)
    pal = pallas_settle_filter_loglik(y, T, RQR, Z, H, d, n_settle=16,
                                      tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-8)
