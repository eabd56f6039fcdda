"""Conditional-forecast core against dense constrained-least-squares
oracles (the Waggoner-Zha construction solved independently with numpy)."""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.stats.forecast import _conditional_core


def _system(seed=0, n=4, k=2, m=3):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    T = 0.8 * M / np.max(np.abs(np.linalg.eigvals(M)))
    R = rng.normal(size=(n, m))
    Q = np.diag(rng.uniform(0.5, 1.5, m) * 0.01)
    Z = rng.normal(size=(k, n))
    d = rng.normal(size=(k,)) * 0.1
    xT = rng.normal(size=(n,)) * 0.05
    return (jnp.asarray(T), jnp.asarray(R), jnp.asarray(Q), jnp.asarray(Z),
            jnp.asarray(d), jnp.asarray(xT))


def _dense_oracle(T, R, Q, Z, d, xT, target, mask, horizon):
    """Brute force: build the full linear map shocks->conditioned gaps and
    solve the Q-weighted minimum-norm problem with pinv in whitened space."""
    T, R, Q, Z, d, xT = (np.asarray(a) for a in (T, R, Q, Z, d, xT))
    n, m = R.shape
    k = Z.shape[0]
    # baseline (no shocks)
    base = []
    x = xT.copy()
    for _ in range(horizon):
        x = T @ x
        base.append(Z @ x + d)
    base = np.asarray(base)
    # dense map M[(h,i),(s,j)] = (Z T^{h-s} R)_{ij} for s <= h
    M = np.zeros((horizon * k, horizon * m))
    Tp = [np.eye(n)]
    for _ in range(horizon - 1):
        Tp.append(T @ Tp[-1])
    for h in range(horizon):
        for s in range(h + 1):
            M[h * k:(h + 1) * k, s * m:(s + 1) * m] = Z @ Tp[h - s] @ R
    sel = np.asarray(mask).reshape(-1)
    A = M[sel]
    r = (np.asarray(target) - base).reshape(-1)[sel]
    # minimize eps' Qblk^{-1} eps s.t. A eps = r: eps = L w, w = pinv(A L) r
    L = np.linalg.cholesky(np.kron(np.eye(horizon), Q))
    w = np.linalg.pinv(A @ L) @ r
    return (L @ w).reshape(horizon, m)


def test_least_norm_shocks_match_dense_pinv_oracle():
    T, R, Q, Z, d, xT = _system(seed=1)
    horizon = 6
    mask = np.zeros((horizon, 2), dtype=bool)
    mask[0, 0] = mask[2, 1] = mask[4, 0] = True
    target = np.zeros((horizon, 2))
    target[0, 0], target[2, 1], target[4, 0] = 0.02, -0.01, 0.015

    ys, eps, baseline = _conditional_core(
        T, R, Q, Z, d, xT, jnp.asarray(target), jnp.asarray(mask), horizon)
    eps_ref = _dense_oracle(T, R, Q, Z, d, xT, target, mask, horizon)
    np.testing.assert_allclose(np.asarray(eps), eps_ref, atol=1e-9)
    # the conditioned entries are hit exactly
    np.testing.assert_allclose(np.asarray(ys)[mask], target[mask], atol=1e-9)


def test_conditioning_every_entry_reproduces_target_path():
    """With every observable conditioned (and enough shocks), the forecast
    IS the target path."""
    T, R, Q, Z, d, xT = _system(seed=2, n=4, k=2, m=3)
    horizon = 5
    rng = np.random.default_rng(3)
    target = 0.01 * rng.normal(size=(horizon, 2))
    mask = np.ones((horizon, 2), dtype=bool)
    ys, _, _ = _conditional_core(T, R, Q, Z, d, xT, jnp.asarray(target),
                                 jnp.asarray(mask), horizon)
    np.testing.assert_allclose(np.asarray(ys), target, atol=1e-8)


def test_no_conditions_is_pure_baseline_with_zero_shocks():
    T, R, Q, Z, d, xT = _system(seed=4)
    horizon = 7
    mask = np.zeros((horizon, 2), dtype=bool)
    ys, eps, baseline = _conditional_core(
        T, R, Q, Z, d, xT, jnp.zeros((horizon, 2)), jnp.asarray(mask),
        horizon)
    np.testing.assert_allclose(np.asarray(eps), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(baseline),
                               atol=1e-12)


def test_cheaper_shocks_do_more_of_the_work():
    """Q-weighting: make shock 0 vastly cheaper (bigger variance) and the
    least-norm solution must lean on it."""
    T, R, Q, Z, d, xT = _system(seed=5)
    horizon = 4
    mask = np.zeros((horizon, 2), dtype=bool)
    mask[1, 0] = True
    target = np.zeros((horizon, 2))
    target[1, 0] = 0.05

    Q_cheap = jnp.asarray(np.diag([1.0, 1e-6, 1e-6]))
    _, eps, _ = _conditional_core(T, R, Q_cheap, Z, d, xT,
                                  jnp.asarray(target), jnp.asarray(mask),
                                  horizon)
    e = np.asarray(eps)
    assert np.abs(e[:, 0]).max() > 50 * np.abs(e[:, 1:]).max()


def test_future_conditions_do_not_leak_before_time_zero():
    """Shocks are chosen from time 0 onward only; a condition at horizon h
    implies zero shocks AFTER h (no anticipation backward in the stacked
    triangular map — later shocks cannot affect earlier targets, so the
    least-norm solution never uses them)."""
    T, R, Q, Z, d, xT = _system(seed=6)
    horizon = 6
    mask = np.zeros((horizon, 2), dtype=bool)
    mask[2, 1] = True
    target = np.zeros((horizon, 2))
    target[2, 1] = 0.03
    _, eps, _ = _conditional_core(T, R, Q, Z, d, xT, jnp.asarray(target),
                                  jnp.asarray(mask), horizon)
    e = np.asarray(eps)
    np.testing.assert_allclose(e[3:], 0.0, atol=1e-10)
    assert np.abs(e[:3]).max() > 1e-4


def test_conditional_core_is_jittable_and_vmappable():
    T, R, Q, Z, d, xT = _system(seed=7)
    horizon = 4
    mask = np.zeros((horizon, 2), dtype=bool)
    mask[1, 0] = True
    target = np.zeros((horizon, 2))
    target[1, 0] = 0.02

    def run(x0):
        ys, eps, _ = _conditional_core(T, R, Q, Z, d, x0,
                                       jnp.asarray(target),
                                       jnp.asarray(mask), horizon)
        return ys

    X0 = jnp.stack([xT, xT * 0.5, xT * 0.0])
    out = jax.jit(jax.vmap(run))(X0)
    assert out.shape == (3, horizon, 2)
    # every batch member hits its target
    np.testing.assert_allclose(np.asarray(out)[:, 1, 0], 0.02, atol=1e-8)
