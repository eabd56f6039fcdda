"""Unit tests for perturbation helpers (models/perturbation.py):
spectral_radius (Gelfand squaring), solve_policy_backward, gecon_matrices.
"""

import jax.numpy as jnp
import numpy as np

from geconpy_tpu.models.perturbation import (
    gecon_matrices,
    solve_policy_backward,
    spectral_radius,
)


def test_spectral_radius_diagonal():
    T = jnp.diag(jnp.array([0.3, -0.95, 0.5]))
    np.testing.assert_allclose(float(spectral_radius(T)), 0.95, rtol=1e-6)


def test_spectral_radius_rotation_complex_pair():
    th = 0.4
    r = 0.8
    T = r * jnp.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    # Gelfand: ||T^k||^(1/k) carries an O(c^(1/k)) constant — 1e-3 at k=1024
    np.testing.assert_allclose(float(spectral_radius(T)), r, rtol=1e-3)


def test_spectral_radius_defective_matrix():
    # Jordan block: power iteration-ish methods struggle; Gelfand handles it
    T = jnp.array([[0.9, 1.0], [0.0, 0.9]])
    np.testing.assert_allclose(float(spectral_radius(T)), 0.9, rtol=1e-2)


def test_spectral_radius_zero_matrix():
    assert float(spectral_radius(jnp.zeros((3, 3)))) < 1e-6


def test_solve_policy_backward_ar_system():
    # x_t = 0.8 x_{t-1} + eps; y_t = 0.5 x_t  (written as A y- + B y + D e = 0)
    A = jnp.array([[-0.8, 0.0], [0.0, 0.0]])
    B = jnp.array([[1.0, 0.0], [-0.5, 1.0]])
    D = jnp.array([[-1.0], [0.0]])
    T, R, ok = solve_policy_backward(A, B, D)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T), [[0.8, 0.0], [0.4, 0.0]],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(R), [[1.0], [0.5]], atol=1e-12)


def test_solve_policy_backward_singular_flags():
    B = jnp.zeros((2, 2))
    T, R, ok = solve_policy_backward(jnp.eye(2), B, jnp.ones((2, 1)))
    assert not bool(ok)


def test_gecon_matrices_partition():
    # states: x (appears with lag); jumps: c
    T = np.array([[0.9, 0.0], [0.5, 0.0]])   # rows: x, c; cols: x, c
    R = np.array([[1.0], [0.3]])
    P, Q, R_out, S, state_idx, jump_idx = gecon_matrices(T, R, ["x", "c"])
    assert list(state_idx) == [0]
    assert list(jump_idx) == [1]
    np.testing.assert_allclose(P, [[0.9]])
    np.testing.assert_allclose(Q, [[1.0]])
    np.testing.assert_allclose(R_out, [[0.5]])
    np.testing.assert_allclose(S, [[0.3]])
