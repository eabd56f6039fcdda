"""Discrete Lyapunov solver (doubling algorithm) with analytic adjoint.

Replaces the reference's host-side ``scipy.linalg.solve_discrete_lyapunov``
call (``gEconpy/model/statespace.py:815``, ``model/statistics/covariance.py:68``)
with an on-device Smith doubling iteration:

    P = T P Tᵀ + Q   via   P_{k+1} = P_k + A_k P_k A_kᵀ,  A_{k+1} = A_k²

which converges quadratically for stable T (spectral radius < 1) — ~50
doublings cover 2^50 periods.  Differentiable through a ``custom_vjp``
solving the adjoint Lyapunov equation  W = Tᵀ W T + P̄  with the same kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["solve_discrete_lyapunov"]


@highest_precision
def _doubling(T, Q, tol: float, maxiter: int):
    import numpy as np

    # convergence tolerance can't beat machine epsilon (float32 on TPU)
    tol = max(tol, 10 * float(np.finfo(np.dtype(T.dtype)).eps))

    def cond(state):
        A, P, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        A, P, it, done = state
        P_new = P + A @ P @ A.T
        A_new = A @ A
        delta = jnp.max(jnp.abs(P_new - P))
        finite = jnp.isfinite(delta)
        return (A_new, P_new, it + 1, (delta < tol) | ~finite)

    A0 = T
    state0 = (A0, Q, jnp.asarray(0), jnp.asarray(False))
    _, P, _, _ = jax.lax.while_loop(cond, body, state0)
    # enforce symmetry lost to roundoff
    return 0.5 * (P + P.T)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def solve_discrete_lyapunov(T, Q, tol: float = 1e-12, maxiter: int = 60):
    """Solve ``P = T P Tᵀ + Q`` for stable T, on device, differentiable."""
    return _doubling(T, Q, tol, maxiter)


def _lyap_fwd(T, Q, tol, maxiter):
    P = _doubling(T, Q, tol, maxiter)
    return P, (T, P)


def _lyap_bwd(tol, maxiter, residuals, P_bar):
    """dP - T dP Tᵀ = dT P Tᵀ + T P dTᵀ + dQ.  With W solving the adjoint
    equation  W = Tᵀ W T + P̄:  Q̄ = W  and  T̄ = (W + Wᵀ) T P."""
    T, P = residuals
    W = _doubling(T.T, P_bar, tol, maxiter)
    Q_bar = W
    T_bar = (W + W.T) @ T @ P
    return (T_bar, Q_bar)


solve_discrete_lyapunov.defvjp(_lyap_fwd, _lyap_bwd)
