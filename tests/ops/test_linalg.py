"""Pivoted Gauss-Jordan solve/inverse: oracle vs numpy LAPACK, pivoting
correctness on zero-diagonal matrices, implicit-adjoint gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.linalg import gj_inverse, gj_solve


@pytest.mark.parametrize("n,k", [(3, 1), (7, 7), (23, 5), (33, 33)])
def test_matches_numpy_solve(n, k):
    rng = np.random.default_rng(n * 100 + k)
    M = rng.standard_normal((n, n)) + 2.0 * np.eye(n)
    B = rng.standard_normal((n, k))
    X = np.asarray(gj_solve(jnp.asarray(M), jnp.asarray(B)))
    np.testing.assert_allclose(X, np.linalg.solve(M, B), rtol=1e-9, atol=1e-10)


def test_pivoting_handles_zero_diagonal():
    # leading diagonal entry is exactly zero: unpivoted elimination dies
    M = np.array([[0.0, 1.0], [1.0, 0.0]])
    B = np.array([[2.0], [3.0]])
    X = np.asarray(gj_solve(jnp.asarray(M), jnp.asarray(B)))
    np.testing.assert_allclose(X, [[3.0], [2.0]], atol=1e-12)


def test_permutation_matrix_inverse():
    rng = np.random.default_rng(0)
    P = np.eye(8)[rng.permutation(8)]
    np.testing.assert_allclose(np.asarray(gj_inverse(jnp.asarray(P))), P.T,
                               atol=1e-12)


def test_singular_yields_nonfinite_not_exception():
    M = jnp.ones((4, 4))
    X = gj_solve(M, jnp.eye(4))
    assert not bool(jnp.all(jnp.isfinite(X)))


def test_vmap_batch_matches_loop():
    rng = np.random.default_rng(1)
    M = rng.standard_normal((16, 9, 9)) + 2.0 * np.eye(9)
    B = rng.standard_normal((16, 9, 3))
    batched = np.asarray(jax.vmap(gj_solve)(jnp.asarray(M), jnp.asarray(B)))
    for i in range(16):
        np.testing.assert_allclose(batched[i], np.linalg.solve(M[i], B[i]),
                                   rtol=1e-9, atol=1e-10)


def test_gradient_matches_jnp_solve():
    rng = np.random.default_rng(2)
    M = jnp.asarray(rng.standard_normal((6, 6)) + 2.0 * np.eye(6))
    B = jnp.asarray(rng.standard_normal((6, 2)))

    def loss_gj(M, B):
        return jnp.sum(jnp.sin(gj_solve(M, B)))

    def loss_ref(M, B):
        return jnp.sum(jnp.sin(jnp.linalg.solve(M, B)))

    gM, gB = jax.grad(loss_gj, argnums=(0, 1))(M, B)
    gM_ref, gB_ref = jax.grad(loss_ref, argnums=(0, 1))(M, B)
    np.testing.assert_allclose(np.asarray(gM), np.asarray(gM_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gB), np.asarray(gB_ref),
                               rtol=1e-8, atol=1e-10)


def test_gradient_finite_differences():
    rng = np.random.default_rng(3)
    M0 = rng.standard_normal((5, 5)) + 2.0 * np.eye(5)
    B0 = rng.standard_normal((5, 1))

    def loss(m_flat):
        M = m_flat.reshape(5, 5)
        return jnp.sum(gj_solve(M, jnp.asarray(B0)) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(M0.ravel())))
    h = 1e-6
    for idx in [0, 7, 13, 24]:
        e = np.zeros(25)
        e[idx] = h
        fd = (float(loss(jnp.asarray(M0.ravel() + e))) -
              float(loss(jnp.asarray(M0.ravel() - e)))) / (2 * h)
        np.testing.assert_allclose(g[idx], fd, rtol=5e-5, atol=1e-7)


def test_gj_solve_supports_forward_mode():
    """gj_solve must stay forward-differentiable (custom_linear_solve, not
    custom_vjp): jax.hessian / HVP machinery (MAP Newton, Laplace evidence,
    curvature mass seeding) runs jacfwd over logposts containing it."""
    rng = np.random.default_rng(3)
    M0 = jnp.asarray(rng.standard_normal((4, 4)) + 2.0 * np.eye(4))
    B0 = jnp.asarray(rng.standard_normal((4, 1)))

    def f(s):
        return jnp.sum(gj_solve(M0 + s[0] * jnp.eye(4), B0) ** 3)

    # forward-over-reverse second derivative vs central FD of the gradient
    H = float(jax.hessian(f)(jnp.zeros(1))[0, 0])
    g = jax.grad(f)
    h = 1e-5
    fd = (float(g(jnp.array([h]))[0]) - float(g(jnp.array([-h]))[0])) / (2 * h)
    np.testing.assert_allclose(H, fd, rtol=1e-4)

    # plain jvp through the solve
    tangent = jax.jvp(lambda m: gj_solve(m, B0), (M0,), (jnp.eye(4),))[1]
    Minv = jnp.linalg.inv(M0)
    np.testing.assert_allclose(np.asarray(tangent),
                               np.asarray(-Minv @ jnp.eye(4) @ Minv @ B0),
                               rtol=1e-8, atol=1e-10)
