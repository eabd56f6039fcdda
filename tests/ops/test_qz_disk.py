"""Inverse-free disk-function pencil splitting unit tests (ops/qz_disk.py).

This is the device-side replacement for LAPACK's ordered QZ (reference:
gEconpy/solvers/gensys.py:190 uses complex QZ with an 'ouc' sort).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from geconpy_tpu.ops.qz_disk import disk_function_split


def test_diagonal_pencil_split():
    # eigenvalues are A_ii / B_ii: {0.5, 0.9, 2.0, 10.0} -> 2 inside unit disk
    A = jnp.diag(jnp.array([0.5, 0.9, 2.0, 10.0]))
    B = jnp.eye(4)
    res = disk_function_split(A, B, k_stable=2)
    assert bool(res.converged)
    assert int(res.n_inside) == 2
    # stable subspace = span(e0, e1)
    V = np.asarray(res.V_stable)
    proj = V @ V.T
    np.testing.assert_allclose(proj[:2, :2], np.eye(2), atol=1e-6)
    np.testing.assert_allclose(proj[2:, 2:], 0, atol=1e-6)


def test_random_pencil_matches_ordqz_subspace():
    rng = np.random.default_rng(42)
    n = 8
    A = rng.normal(size=(n, n)) * 2.0
    B = rng.normal(size=(n, n)) + 2 * np.eye(n)
    lam = scipy.linalg.eigvals(A, B)
    k = int(np.sum(np.abs(lam) < 1.0))
    assert 0 < k < n, "test fixture should straddle the unit circle"

    res = disk_function_split(jnp.asarray(A), jnp.asarray(B), k_stable=k)
    assert bool(res.converged)
    assert int(res.n_inside) == k

    # the returned subspace must be invariant: columns of V span the right
    # deflating subspace, i.e. the pencil maps it into a common k-dim space.
    V = np.asarray(res.V_stable, dtype=np.float64)
    AV, BV = A @ V, B @ V
    # rank of [AV BV] stacked must be k (both images in the same subspace)
    s = np.linalg.svd(np.concatenate([AV, BV], axis=1), compute_uv=False)
    assert s[k] < 1e-6 * s[0]


def test_detects_wrong_expected_dimension():
    A = jnp.diag(jnp.array([0.5, 2.0, 3.0]))
    B = jnp.eye(3)
    res = disk_function_split(A, B, k_stable=2)  # truth: only 1 inside
    assert not bool(res.converged)
    assert int(res.n_inside) == 1


def test_radius_scaling():
    # with radius 2.5, eigenvalues {0.5, 2.0} are both inside
    A = jnp.diag(jnp.array([0.5, 2.0]))
    B = jnp.eye(2)
    res = disk_function_split(A, B, k_stable=2, radius=2.5)
    assert bool(res.converged)
    assert int(res.n_inside) == 2


def test_singular_B_infinite_eigenvalue():
    # B singular -> one infinite eigenvalue (outside any disk)
    A = jnp.diag(jnp.array([0.5, 1.0]))
    B = jnp.diag(jnp.array([1.0, 0.0]))
    res = disk_function_split(A, B, k_stable=1)
    assert bool(res.converged)
    assert int(res.n_inside) == 1
    V = np.asarray(res.V_stable)
    np.testing.assert_allclose(np.abs(V[:, 0]), [1.0, 0.0], atol=1e-6)


def test_vmap_and_jit():
    A = jnp.stack([jnp.diag(jnp.array([0.3, 4.0])),
                   jnp.diag(jnp.array([0.8, 1.7]))])
    B = jnp.stack([jnp.eye(2), jnp.eye(2)])
    fn = jax.jit(jax.vmap(lambda a, b: disk_function_split(a, b, k_stable=1)))
    res = fn(A, B)
    assert bool(res.converged[0]) and bool(res.converged[1])
    assert list(np.asarray(res.n_inside)) == [1, 1]
