"""Block-tridiagonal scan solver unit tests (ops/block_tridiag.py).

Reference role: scipy.sparse LU over the stacked perfect-foresight Jacobian
(gEconpy/model/perfect_foresight/assemble.py:8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.block_tridiag import solve_block_tridiagonal


def make_system(key, T, n):
    kA, kB, kC, kd = jax.random.split(key, 4)
    A = 0.3 * jax.random.normal(kA, (T, n, n))
    C = 0.3 * jax.random.normal(kC, (T, n, n))
    # diagonally dominant diagonal blocks keep the system well-conditioned
    B = jax.random.normal(kB, (T, n, n)) + 4.0 * jnp.eye(n)
    d = jax.random.normal(kd, (T, n))
    return A, B, C, d


def dense_solve(A, B, C, d):
    T, n, _ = B.shape
    M = np.zeros((T * n, T * n))
    for t in range(T):
        M[t * n:(t + 1) * n, t * n:(t + 1) * n] = np.asarray(B[t])
        if t > 0:
            M[t * n:(t + 1) * n, (t - 1) * n:t * n] = np.asarray(A[t])
        if t < T - 1:
            M[t * n:(t + 1) * n, (t + 1) * n:(t + 2) * n] = np.asarray(C[t])
    return np.linalg.solve(M, np.asarray(d).ravel()).reshape(T, n)


@pytest.mark.parametrize("T,n", [(3, 2), (10, 4), (50, 3)])
def test_matches_dense_solve(T, n):
    A, B, C, d = make_system(jax.random.PRNGKey(T * 100 + n), T, n)
    x = solve_block_tridiagonal(A, B, C, d)
    x_ref = dense_solve(A, B, C, d)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-10)


def test_single_block_is_plain_solve():
    key = jax.random.PRNGKey(0)
    _, B, _, d = make_system(key, 1, 5)
    x = solve_block_tridiagonal(jnp.zeros_like(B), B, jnp.zeros_like(B), d)
    np.testing.assert_allclose(
        np.asarray(x[0]), np.linalg.solve(np.asarray(B[0]), np.asarray(d[0])),
        rtol=1e-10)


def test_residual_is_zero():
    T, n = 20, 3
    A, B, C, d = make_system(jax.random.PRNGKey(5), T, n)
    x = solve_block_tridiagonal(A, B, C, d)
    resid = []
    for t in range(T):
        r = B[t] @ x[t] - d[t]
        if t > 0:
            r = r + A[t] @ x[t - 1]
        if t < T - 1:
            r = r + C[t] @ x[t + 1]
        resid.append(np.asarray(r))
    assert np.max(np.abs(resid)) < 1e-9


def test_vmap_batch():
    T, n, batch = 8, 3, 4
    keys = jax.random.split(jax.random.PRNGKey(9), batch)
    systems = [make_system(k, T, n) for k in keys]
    A = jnp.stack([s[0] for s in systems])
    B = jnp.stack([s[1] for s in systems])
    C = jnp.stack([s[2] for s in systems])
    d = jnp.stack([s[3] for s in systems])
    xs = jax.vmap(solve_block_tridiagonal)(A, B, C, d)
    for i in range(batch):
        np.testing.assert_allclose(
            np.asarray(xs[i]), dense_solve(A[i], B[i], C[i], d[i]),
            rtol=1e-8, atol=1e-10)


def test_jit_and_grad():
    T, n = 6, 2
    A, B, C, d = make_system(jax.random.PRNGKey(11), T, n)

    def loss(d):
        return jnp.sum(solve_block_tridiagonal(A, B, C, d) ** 2)

    g = jax.jit(jax.grad(loss))(d)
    eps = 1e-6
    probe = jnp.zeros_like(d).at[2, 1].set(1.0)
    fd = (loss(d + eps * probe) - loss(d - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(float(g[2, 1]), float(fd), rtol=1e-5)
