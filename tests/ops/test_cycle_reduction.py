import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.cycle_reduction import (
    cycle_reduction,
    selection_matrix,
    solve_policy_cycle_reduction,
)
from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov


def make_stable_quadratic(n, seed=0):
    """Construct (A, B, C) with a known stable MINIMAL solvent T.

    Cycle reduction needs a proper unit-circle dichotomy (n roots inside,
    n outside — the determinacy condition), so both solvents are
    prescribed:  Q(z) = C (zI - U)(zI - T)  with rho(T) < 1 < min|eig(U)|,
    giving  A = C U T,  B = -C (U + T).
    """
    rng = np.random.default_rng(seed)
    Tv = rng.normal(size=(n, n))
    Tv = 0.5 * Tv / np.abs(np.linalg.eigvals(Tv)).max()
    U = rng.normal(size=(n, n))
    U = 2.0 * U / np.abs(np.linalg.eigvals(U)).min()   # anti-stable
    Cm = np.eye(n) + 0.1 * rng.normal(size=(n, n))
    A = Cm @ U @ Tv
    B = -Cm @ (U + Tv)
    return jnp.asarray(A), jnp.asarray(B), jnp.asarray(Cm), Tv


def test_cycle_reduction_solves_quadratic():
    A, B, C, _ = make_stable_quadratic(8)
    res = cycle_reduction(A, B, C)
    assert bool(res.success)
    resid = np.asarray(A + B @ res.T + C @ res.T @ res.T)
    assert np.abs(resid).max() < 1e-10
    # solvent is stable
    assert np.abs(np.linalg.eigvals(np.asarray(res.T))).max() < 1.0


def test_cycle_reduction_finds_minimal_solvent():
    A, B, C, Tv = make_stable_quadratic(6, seed=3)
    res = cycle_reduction(A, B, C)
    np.testing.assert_allclose(np.asarray(res.T), Tv, atol=1e-9)


def test_selection_matrix():
    A, B, C, _ = make_stable_quadratic(5, seed=1)
    D = jnp.asarray(np.random.default_rng(1).normal(size=(5, 2)))
    T, R, success, *_ = solve_policy_cycle_reduction(A, B, C, D)
    assert bool(success)
    resid = np.asarray((B + C @ T) @ R + D)
    assert np.abs(resid).max() < 1e-10


def test_cycle_reduction_gradient_matches_fd():
    """The custom_vjp adjoint must agree with finite differences."""
    A, B, C, _ = make_stable_quadratic(4, seed=2)

    def loss(params):
        A_, B_, C_ = params
        res = cycle_reduction(A_, B_, C_)
        return jnp.sum(res.T ** 2)

    g = jax.grad(loss)((A, B, C))
    eps = 1e-6
    rng = np.random.default_rng(0)
    for idx, M in enumerate([A, B, C]):
        V = rng.normal(size=M.shape)
        Mp = [A, B, C]
        Mm = [A, B, C]
        Mp[idx] = M + eps * V
        Mm[idx] = M - eps * V
        fd = (loss(tuple(map(jnp.asarray, Mp))) - loss(tuple(map(jnp.asarray, Mm)))) / (2 * eps)
        an = np.sum(np.asarray(g[idx]) * V)
        np.testing.assert_allclose(an, float(fd), rtol=1e-5)


def test_failure_flag_singular():
    """Singular B makes the iteration NaN out: flag, not crash."""
    n = 4
    A = jnp.eye(n) * 2.0
    B = jnp.zeros((n, n))
    C = jnp.eye(n) * 0.5
    res = cycle_reduction(A, B, C, maxiter=50)
    assert not bool(res.success)


def test_policy_solve_rejects_explosive_solvent():
    """An explosive (BK-violating) solvent must flag at the policy level."""
    n = 4
    A = jnp.eye(n) * 2.0
    B = jnp.eye(n) * 0.1
    C = jnp.zeros((n, n))
    D = jnp.ones((n, 1))
    T, R, success, *_ = solve_policy_cycle_reduction(A, B, C, D)
    assert not bool(success)


def test_cycle_reduction_vmap():
    batch = [make_stable_quadratic(5, seed=s)[:3] for s in range(4)]
    A = jnp.stack([b[0] for b in batch])
    B = jnp.stack([b[1] for b in batch])
    C = jnp.stack([b[2] for b in batch])
    res = jax.vmap(lambda a, b, c: cycle_reduction(a, b, c))(A, B, C)
    assert res.T.shape == (4, 5, 5)
    assert bool(jnp.all(res.success))


def test_lyapunov_doubling():
    rng = np.random.default_rng(0)
    T = rng.normal(size=(6, 6))
    T = 0.7 * T / np.abs(np.linalg.eigvals(T)).max()
    Q = rng.normal(size=(6, 6))
    Q = Q @ Q.T
    P = solve_discrete_lyapunov(jnp.asarray(T), jnp.asarray(Q))
    resid = np.asarray(P) - T @ np.asarray(P) @ T.T - Q
    assert np.abs(resid).max() < 1e-10

    from scipy.linalg import solve_discrete_lyapunov as scipy_lyap

    np.testing.assert_allclose(np.asarray(P), scipy_lyap(T, Q), atol=1e-9)


def test_lyapunov_gradient():
    rng = np.random.default_rng(1)
    T = rng.normal(size=(4, 4))
    T = 0.6 * T / np.abs(np.linalg.eigvals(T)).max()
    Q0 = rng.normal(size=(4, 4))
    Q = Q0 @ Q0.T

    def loss(T_, Q_):
        return jnp.sum(solve_discrete_lyapunov(T_, Q_) ** 2)

    gT, gQ = jax.grad(loss, argnums=(0, 1))(jnp.asarray(T), jnp.asarray(Q))
    eps = 1e-6
    VT = rng.normal(size=T.shape)
    VQ0 = rng.normal(size=Q.shape)
    VQ = VQ0 + VQ0.T
    fdT = (loss(jnp.asarray(T + eps * VT), jnp.asarray(Q))
           - loss(jnp.asarray(T - eps * VT), jnp.asarray(Q))) / (2 * eps)
    fdQ = (loss(jnp.asarray(T), jnp.asarray(Q + eps * VQ))
           - loss(jnp.asarray(T), jnp.asarray(Q - eps * VQ))) / (2 * eps)
    np.testing.assert_allclose(np.sum(np.asarray(gT) * VT), float(fdT), rtol=1e-4)
    np.testing.assert_allclose(np.sum(np.asarray(gQ) * VQ), float(fdQ), rtol=1e-4)


def test_static_reduction_exact():
    """QR static elimination gives the same policy as the full solve."""
    from geconpy_tpu import get_example_gcn, model_from_gcn
    from geconpy_tpu.ops.static_reduction import (
        plan_static_reduction,
        solve_policy_reduced,
    )

    m = model_from_gcn(get_example_gcn("nk_full"), verbose=False)
    plan = plan_static_reduction(m.primitives.equations,
                                 m.functions.variables)
    assert len(plan.static_idx) >= 3
    mats = m.linearize_model()
    A, B, C, D = (jnp.asarray(mats[k].to_numpy()) for k in "ABCD")
    T1, R1, ok1, *_ = solve_policy_cycle_reduction(A, B, C, D, tol=1e-14)
    T2, R2, ok2, *_ = solve_policy_reduced(A, B, C, D, plan, tol=1e-14)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-10)

    # vmap-able and differentiable (implicit adjoints flow through)
    def loss(scale):
        T, R, ok, *_ = solve_policy_reduced(A * scale, B, C, D, plan)
        return jnp.sum(T**2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g))
