"""Property tests for the low-level device linear algebra: the unrolled
Gauss-Jordan family (``ops/linalg.py``), the doubling Lyapunov solver
(``ops/lyapunov.py``), and the inverse-free disk split
(``ops/qz_disk.py``) on pencils with KNOWN eigenvalue placements."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from geconpy_tpu.ops.linalg import gj_inverse, gj_solve
from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov
from geconpy_tpu.ops.qz_disk import count_eigs_inside


def test_gj_inverse_matches_numpy_including_pivoting():
    rng = np.random.default_rng(0)
    for trial in range(5):
        A = rng.normal(size=(9, 9))
        np.testing.assert_allclose(np.asarray(gj_inverse(jnp.asarray(A))),
                                   np.linalg.inv(A), rtol=1e-8, atol=1e-10,
                                   err_msg=f"trial {trial}")
    # a matrix whose leading pivot is ZERO requires row pivoting
    A = np.array([[0.0, 1.0, 2.0],
                  [1.0, 0.0, 1.0],
                  [2.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(gj_inverse(jnp.asarray(A))),
                               np.linalg.inv(A), rtol=1e-10)


def test_gj_solve_multiple_rhs_and_grad():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 6)) + 6 * np.eye(6)
    B = rng.normal(size=(6, 4))
    X = np.asarray(gj_solve(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(A @ X, B, atol=1e-10)

    # gradient vs finite differences through the solve
    def loss(a00):
        A_ = jnp.asarray(A).at[0, 0].set(a00)
        return jnp.sum(gj_solve(A_, jnp.asarray(B)) ** 2)

    g = jax.grad(loss)(jnp.asarray(A[0, 0]))
    eps = 1e-6
    fd = (loss(jnp.asarray(A[0, 0] + eps)) - loss(jnp.asarray(A[0, 0] - eps))
          ) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_gj_singular_matrix_yields_nonfinite_not_garbage():
    """A singular system must surface as non-finite output (flag-able), not
    a silently wrong finite solve."""
    A = jnp.asarray(np.outer(np.arange(1.0, 5.0), np.arange(1.0, 5.0)))
    X = gj_inverse(A)
    assert not bool(jnp.all(jnp.isfinite(X)))


def test_lyapunov_matches_scipy_on_random_stable_systems():
    rng = np.random.default_rng(2)
    for rho in (0.5, 0.9, 0.99):
        M = rng.normal(size=(7, 7))
        T = rho * M / np.max(np.abs(np.linalg.eigvals(M)))
        Qm = rng.normal(size=(7, 7))
        Qm = Qm @ Qm.T + 0.1 * np.eye(7)
        P = np.asarray(solve_discrete_lyapunov(jnp.asarray(T),
                                               jnp.asarray(Qm)))
        P_ref = sla.solve_discrete_lyapunov(T, Qm)
        np.testing.assert_allclose(P, P_ref, rtol=1e-8, err_msg=f"rho={rho}")


def test_lyapunov_gradient_is_implicit_adjoint():
    """d tr(P) / dT via the custom VJP must match finite differences (the
    primal is a while_loop — only the analytic adjoint makes this work)."""
    T = jnp.asarray([[0.8, 0.2], [0.0, 0.5]])
    Qm = jnp.eye(2)

    def loss(t01):
        T_ = T.at[0, 1].set(t01)
        return jnp.trace(solve_discrete_lyapunov(T_, Qm))

    g = jax.grad(loss)(jnp.asarray(0.2))
    eps = 1e-6
    fd = (loss(jnp.asarray(0.2 + eps)) - loss(jnp.asarray(0.2 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_count_eigs_inside_known_diagonal_pencil():
    """Diagonal pencil with eigenvalues placed by hand: the disk count must
    be exact for every radius that avoids the boundary."""
    eigs = np.array([0.3, 0.7, 0.95, 1.05, 2.0, 10.0])
    A = jnp.diag(jnp.asarray(eigs))            # A x = lambda B x with B = I
    B = jnp.eye(6)
    for radius, expect in [(0.5, 1), (0.9, 2), (1.0, 3), (1.5, 4), (20.0, 6)]:
        res = count_eigs_inside(A, B, radius=radius)
        count = int(res[0]) if isinstance(res, tuple) else int(res)
        assert count == expect, (radius, count)


def test_count_eigs_invariant_under_orthogonal_equivalence():
    """Q1 A Q2, Q1 B Q2 has the same generalized eigenvalues: the count
    must not change under orthogonal row/column transforms."""
    rng = np.random.default_rng(3)
    eigs = np.array([0.2, 0.8, 1.3, 5.0])
    A0 = np.diag(eigs)
    B0 = np.eye(4)
    Q1, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    Q2, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    A = jnp.asarray(Q1 @ A0 @ Q2)
    B = jnp.asarray(Q1 @ B0 @ Q2)
    res = count_eigs_inside(A, B, radius=1.0)
    count = int(res[0]) if isinstance(res, tuple) else int(res)
    assert count == 2


def test_count_eigs_infinite_eigenvalue_is_outside():
    """A singular B row (infinite generalized eigenvalue) counts as outside
    every finite disk — the forward-looking explosive root convention."""
    A = jnp.diag(jnp.asarray([0.5, 1.0, 2.0]))
    B = jnp.diag(jnp.asarray([1.0, 0.0, 1.0]))   # middle eig = infinity
    res = count_eigs_inside(A, B, radius=1.2)
    count = int(res[0]) if isinstance(res, tuple) else int(res)
    assert count == 1
