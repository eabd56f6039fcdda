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


def test_symbolic_linearizer_matches_jacfwd_exactly():
    """The build-time sparse symbolic Jacobians (f_lin_nz, reference:
    build_symbolic_jacobians at gEconpy/model/compile.py:163) must equal
    runtime jacfwd of the lowered residual to machine precision, loglin
    scaling included — on models spanning Bellman FOCs, CES bundles and
    pure identities."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from geconpy_tpu import get_example_gcn, model_from_gcn
    from geconpy_tpu.models.perturbation import make_linearizer

    for name in ("rbc", "nk_3eq", "rbc_ces", "burnside"):
        m = model_from_gcn(get_example_gcn(name), verbose=False)
        mf = m.functions
        assert mf.f_lin_nz is not None and len(mf.lin_rows) > 0, name
        # sparsity is real: far fewer entries than the dense stacked block
        assert len(mf.lin_rows) < 0.5 * mf.n_variables * (
            3 * mf.n_variables + mf.n_shocks), name
        lin_sym = make_linearizer(mf, True)
        lin_ad = make_linearizer(dataclasses.replace(mf, f_lin_nz=None), True)
        sol = jax.jit(m.ss_solver)(jnp.asarray(m.default_theta()))
        a = jax.jit(lin_sym)(sol.x_ss, sol.theta_full)
        b = jax.jit(lin_ad)(sol.x_ss, sol.theta_full)
        for blk in ("A", "B", "C", "D"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, blk)), np.asarray(getattr(b, blk)),
                atol=1e-12, err_msg=f"{name}.{blk}")


def test_symbolic_linearizer_is_differentiable_wrt_theta():
    """Gradients must flow through the scattered symbolic entries (the
    estimation pipeline differentiates the linearization wrt parameters)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from geconpy_tpu import get_example_gcn, model_from_gcn
    from geconpy_tpu.models.perturbation import make_linearizer

    m = model_from_gcn(get_example_gcn("rbc"), verbose=False)
    mf = m.functions
    lin_sym = make_linearizer(mf, True)
    lin_ad = make_linearizer(dataclasses.replace(mf, f_lin_nz=None), True)
    sol = jax.jit(m.ss_solver)(jnp.asarray(m.default_theta()))

    def loss(linearize, th):
        out = linearize(sol.x_ss, th)
        return jnp.sum(out.B ** 2) + jnp.sum(out.A * out.C)

    g_sym = jax.grad(lambda th: loss(lin_sym, th))(sol.theta_full)
    g_ad = jax.grad(lambda th: loss(lin_ad, th))(sol.theta_full)
    np.testing.assert_allclose(np.asarray(g_sym), np.asarray(g_ad),
                               atol=1e-10)
