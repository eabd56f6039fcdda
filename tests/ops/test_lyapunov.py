"""Discrete Lyapunov doubling solver unit tests (ops/lyapunov.py).

Reference role: scipy.linalg.solve_discrete_lyapunov at
gEconpy/model/statespace.py:815 and model/statistics/covariance.py:68.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov


def stable_matrix(key, n, rho=0.9):
    M = jax.random.normal(key, (n, n))
    return rho * M / jnp.max(jnp.abs(jnp.linalg.eigvals(M)))


@pytest.mark.parametrize("n", [2, 5, 12])
def test_matches_scipy(n):
    key = jax.random.PRNGKey(n)
    k1, k2 = jax.random.split(key)
    T = stable_matrix(k1, n)
    L = jax.random.normal(k2, (n, n))
    Q = L @ L.T + jnp.eye(n)
    P = solve_discrete_lyapunov(T, Q)
    P_ref = scipy.linalg.solve_discrete_lyapunov(np.asarray(T), np.asarray(Q))
    np.testing.assert_allclose(np.asarray(P), P_ref, rtol=1e-9, atol=1e-9)


def test_symmetry_enforced():
    key = jax.random.PRNGKey(0)
    T = stable_matrix(key, 6)
    Q = jnp.eye(6)
    P = solve_discrete_lyapunov(T, Q)
    np.testing.assert_allclose(np.asarray(P), np.asarray(P.T), atol=0)


def test_near_unit_root_converges():
    T = jnp.diag(jnp.array([0.999, 0.5]))
    Q = jnp.eye(2)
    P = solve_discrete_lyapunov(T, Q)
    # analytic: P_ii = 1 / (1 - T_ii^2)
    np.testing.assert_allclose(
        np.diag(np.asarray(P)), [1 / (1 - 0.999**2), 1 / (1 - 0.25)], rtol=1e-8)


def test_gradient_matches_finite_differences():
    n = 4
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    T = stable_matrix(k1, n)
    L = jax.random.normal(k2, (n, n)) * 0.3
    Q = L @ L.T + jnp.eye(n)

    def loss(T, Q):
        return jnp.sum(solve_discrete_lyapunov(T, Q) ** 2)

    gT, gQ = jax.grad(loss, argnums=(0, 1))(T, Q)

    eps = 1e-6
    rng = np.random.default_rng(0)
    for g, arg, idx in ((gT, 0, (1, 2)), (gQ, 1, (0, 3))):
        d = np.zeros((n, n))
        d[idx] = 1.0
        d = jnp.asarray(d)
        args_p = (T + eps * d, Q) if arg == 0 else (T, Q + eps * d)
        args_m = (T - eps * d, Q) if arg == 0 else (T, Q - eps * d)
        fd = (loss(*args_p) - loss(*args_m)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=1e-4)


def test_vmap_over_batch():
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, 8)
    Ts = jnp.stack([stable_matrix(k, 3) for k in keys])
    Q = jnp.eye(3)
    Ps = jax.vmap(lambda T: solve_discrete_lyapunov(T, Q))(Ts)
    for i in range(8):
        ref = scipy.linalg.solve_discrete_lyapunov(np.asarray(Ts[i]), np.eye(3))
        np.testing.assert_allclose(np.asarray(Ps[i]), ref, rtol=1e-8, atol=1e-9)


def test_jit_compiles():
    T = jnp.diag(jnp.array([0.5, 0.2]))
    P = jax.jit(solve_discrete_lyapunov)(T, jnp.eye(2))
    np.testing.assert_allclose(np.diag(np.asarray(P)),
                               [1 / (1 - 0.25), 1 / (1 - 0.04)], rtol=1e-10)
