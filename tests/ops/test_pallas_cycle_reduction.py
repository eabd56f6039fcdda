"""Interpret-mode parity tests for the Pallas batched cycle-reduction kernel.

Runs the kernel in Pallas interpret mode on CPU (the real-TPU path is
exercised by the benchmark suite) against the XLA ``cycle_reduction`` path
on the reduced SW-2007 pencil.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.ops.cycle_reduction import cycle_reduction
from geconpy_tpu.ops.pallas_cycle_reduction import (
    pallas_cycle_reduction, static_pivot_order)


@pytest.fixture(scope="module")
def sw_pencil():
    model = model_from_gcn(get_example_gcn("sw2007"), verbose=False)
    model.steady_state()
    lin = model.linearize_model()
    A, B, C = (np.asarray(lin[k], np.float64) for k in ("A", "B", "C"))
    plan = model.static_reduction
    s, d = plan.static_idx, plan.dynamic_idx
    n_s = len(s)
    Q, _ = np.linalg.qr(B[:, s], mode="complete")
    return tuple((Q.T @ M[:, d])[n_s:] for M in (A, B, C))


def _jittered_batch(pencil, batch, scale, seed):
    A0, A1, A2 = pencil
    n = A0.shape[0]
    rng = np.random.default_rng(seed)

    def jit(M):
        return np.stack([M + scale * rng.standard_normal((n, n))
                         * np.abs(M).max() for _ in range(batch)])

    Ab, Bb, Cb = jit(A0), jit(A1), jit(A2)
    Ab[0], Bb[0], Cb[0] = A0, A1, A2
    return Ab, Bb, Cb


def test_parity_with_xla_path(sw_pencil):
    Ab, Bb, Cb = _jittered_batch(sw_pencil, batch=8, scale=3e-3, seed=3)
    order = static_pivot_order(sw_pencil[1])
    T_pal, ok = pallas_cycle_reduction(
        jnp.asarray(Ab), jnp.asarray(Bb), jnp.asarray(Cb), order=order,
        tile=8, interpret=True)
    T_pal, ok = np.asarray(T_pal), np.asarray(ok)
    n_checked = 0
    for i in range(len(Ab)):
        res = cycle_reduction(jnp.asarray(Ab[i]), jnp.asarray(Bb[i]),
                              jnp.asarray(Cb[i]))
        if not bool(res.success):
            # BK-violating jitter: the kernel must flag it too
            assert not ok[i]
            continue
        rho = np.abs(np.linalg.eigvals(np.asarray(res.T))).max()
        if rho > 0.995:       # near-unit-root: slow tail, may exceed n_iter
            continue
        assert ok[i], f"draw {i} flagged despite XLA success"
        np.testing.assert_allclose(T_pal[i], np.asarray(res.T), atol=1e-10)
        n_checked += 1
    assert n_checked >= 3


def test_flags_divergent_draw(sw_pencil):
    """A BK-violating pencil must come back success=False (the XLA path's
    explosive-solvent residual can be tiny; the tail check catches it)."""
    A0, A1, A2 = sw_pencil
    n = A0.shape[0]
    rng = np.random.default_rng(99)
    Ab = np.stack([A0, A0 + 0.05 * rng.standard_normal((n, n))
                   * np.abs(A0).max()])
    Bb = np.stack([A1, A1 + 0.05 * rng.standard_normal((n, n))
                   * np.abs(A1).max()])
    Cb = np.stack([A2, A2 + 0.05 * rng.standard_normal((n, n))
                   * np.abs(A2).max()])
    order = static_pivot_order(A1)
    _, ok = pallas_cycle_reduction(
        jnp.asarray(Ab), jnp.asarray(Bb), jnp.asarray(Cb), order=order,
        tile=2, interpret=True)
    assert bool(ok[0]) and not bool(ok[1])


def test_cycle_reduction_divergence_not_success(sw_pencil):
    """Regression: the XLA path used to report success on a divergent
    iteration that landed on the explosive (non-minimal) solvent."""
    A0, A1, A2 = sw_pencil
    n = A0.shape[0]
    rng = np.random.default_rng(99)
    res = cycle_reduction(
        jnp.asarray(A0 + 0.05 * rng.standard_normal((n, n)) * np.abs(A0).max()),
        jnp.asarray(A1 + 0.05 * rng.standard_normal((n, n)) * np.abs(A1).max()),
        jnp.asarray(A2 + 0.05 * rng.standard_normal((n, n)) * np.abs(A2).max()))
    assert not bool(res.success)


def test_without_order_succeeds_via_pivoting(sw_pencil):
    """The reduced B has structural zero pivots: per-lane partial pivoting
    must handle them without any static pre-permutation."""
    A0, A1, A2 = sw_pencil
    T, ok = pallas_cycle_reduction(
        jnp.asarray(A0[None]), jnp.asarray(A1[None]), jnp.asarray(A2[None]),
        order=None, tile=1, interpret=True)
    assert bool(ok[0])
    res = cycle_reduction(jnp.asarray(A0), jnp.asarray(A1), jnp.asarray(A2))
    np.testing.assert_allclose(np.asarray(T[0]), np.asarray(res.T),
                               atol=1e-10)
