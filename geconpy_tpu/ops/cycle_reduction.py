"""Cycle-reduction policy-function solver, fully on device.

Solves the quadratic matrix equation of the first-order perturbation

    A + B T + C T**2 = 0

for the minimal solvent T (policy y_t = T y_{t-1} + R eps_t), using the
Bini-Latouche-Meini cycle-reduction iteration (quadratic convergence).

Role parity with ``gEconpy/solvers/cycle_reduction.py``
(cycle_reduction_numpy:23, _cycle_reduction_core:127, scan_cycle_reduction:297)
and ``gEconpy/solvers/shared.py`` (o1_policy_function_adjoints:12,
pt_compute_selection_matrix:74).  TPU-first design decisions:

- the iteration is a ``lax.while_loop`` of batched GEMMs + one LU solve per
  step — pure XLA, jit/vmap-friendly, MXU-bound;
- failure is a flag (NaN-safe), never an exception, so bad MCMC draws are
  rejected instead of crashing a batched chain;
- the gradient is an analytic implicit-function adjoint registered as
  ``custom_vjp``: the differential of the residual gives the generalized
  Sylvester equation  (B + C T) dT + C dT T = -(dA + dB T + dC T^2),
  whose adjoint is solved in vectorized (Kronecker) form.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .linalg import gj_inverse, gj_solve
from .precision import highest_precision

__all__ = ["cycle_reduction", "selection_matrix", "solve_adjoint_sylvester",
           "solve_policy_cycle_reduction",
           "CycleReductionResult"]


class CycleReductionResult(NamedTuple):
    T: jax.Array
    success: jax.Array
    n_iter: jax.Array
    resid_norm: jax.Array


@highest_precision
def _cycle_reduction_raw(A, B, C, tol: float, maxiter: int):
    """Core iteration.  Returns (T, converged, n_iter)."""
    import numpy as np

    n = A.shape[0]
    dtype = A.dtype
    # convergence tolerance can't beat machine epsilon (float32 on TPU)
    tol = max(tol, 10 * float(np.finfo(np.dtype(dtype)).eps))

    def cond(state):
        A0, A1, A2, Ahat, it, best_crit, done = state
        return (~done) & (it < maxiter)

    def body(state):
        A0, A1, A2, Ahat, it, best_crit, done = state
        # one LU factorization reused for both right-hand sides
        rhs = jnp.concatenate([A0, A2], axis=1)          # (n, 2n)
        Q = jnp.linalg.solve(A1, rhs)
        Q0 = Q[:, :n]
        Q2 = Q[:, n:]
        A1_new = A1 - A0 @ Q2 - A2 @ Q0
        Ahat_new = Ahat - A2 @ Q0
        A0_new = -A0 @ Q0
        A2_new = -A2 @ Q2
        crit = jnp.max(jnp.abs(A0_new)) + jnp.max(jnp.abs(A2_new))
        finite = jnp.isfinite(crit)
        converged = finite & (crit < tol)
        best_crit = jnp.where(finite, jnp.minimum(best_crit, crit), best_crit)
        return (A0_new, A1_new, A2_new, Ahat_new, it + 1, best_crit,
                converged | ~finite)

    state0 = (A, B, C, B, jnp.asarray(0), jnp.asarray(jnp.inf, A.dtype),
              jnp.asarray(False))
    A0f, A1f, A2f, Ahatf, n_iter, best_crit, _ = jax.lax.while_loop(
        cond, body, state0)
    T = -jnp.linalg.solve(Ahatf, A)
    # best_crit separates the two ways the loop can hit a non-finite step:
    # a *divergent* run (no stable solvent exists; tails grow from O(1) and
    # T is the explosive root — best_crit stays O(1)) vs a benign breakdown
    # after the tails already shrank (A1_inf near-singular; T is fine).
    return T, n_iter, best_crit


@highest_precision
def _policy_residual_norm(A, B, C, T):
    R = A + B @ T + C @ T @ T
    return jnp.max(jnp.abs(R))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cycle_reduction_T(A, B, C, tol: float, maxiter: int):
    return _cycle_reduction_raw(A, B, C, tol, maxiter)


def _cr_fwd(A, B, C, tol, maxiter):
    T, n_iter, best_crit = _cycle_reduction_T(A, B, C, tol, maxiter)
    return (T, n_iter, best_crit), (B, C, T)


@highest_precision
def solve_adjoint_sylvester(M, C, T, G, iters: int = 30):
    """Solve the adjoint generalized Sylvester equation
    ``Mᵀ W + Cᵀ W Tᵀ = G``  by Smith doubling.

    Rewrite as the fixed point  W = G₀ - S W Tᵀ  with  S = M⁻ᵀ Cᵀ and
    G₀ = M⁻ᵀ G, whose Neumann series  W = Σ_k (-S)^k G₀ (Tᵀ)^k  converges
    because rho(S)·rho(T) < 1 exactly when the pencil has a proper
    unit-circle dichotomy (rho(T) < 1, |unstable roots| > 1).  Squaring the
    operators doubles the number of summed terms per iteration, so ``iters``
    iterations capture 2^iters terms — machine-exact even near unit roots.

    The loop exits early once the correction underflows relative to W
    (typically 6-10 doublings away from unit roots); ``iters`` is the hard
    cap.  This runs only inside backward passes, so the non-reverse-
    differentiable ``while_loop`` is fine.

    O(n³) per iteration and O(n²) memory, replacing the kron-vectorized
    solve (O(n⁴) memory, O(n⁶) flops) from the reference's adjoint
    (``gEconpy/solvers/shared.py:12`` o1_policy_function_adjoints).
    """
    import numpy as np

    # one explicit inverse (unrolled pivoted Gauss-Jordan — batched LU is
    # sequential per element on TPU) reused for both right-hand sides
    Mt_inv = gj_inverse(M.T)
    S = -(Mt_inv @ C.T)
    W0 = Mt_inv @ G
    eps = float(np.finfo(np.dtype(W0.dtype)).eps)

    n = W0.shape[0]

    def cond(carry):
        _, _, _, it, done = carry
        return (~done) & (it < iters)

    def body(carry):
        W, S_k, T_k, it, _ = carry
        # fuse the correction and the operator squaring into one matmul
        # with a shared left factor: S_k @ [W T_k | S_k] — same FLOPs, one
        # fewer kernel launch and a wider (better-tiled) MXU matmul per
        # doubling at the batched (n ~ 33) hot-path sizes
        WT = W @ T_k
        both = S_k @ jnp.concatenate([WT, S_k], axis=-1)
        delta, S_next = both[..., :n], both[..., n:]
        W_new = W + delta
        small = jnp.max(jnp.abs(delta)) <= eps * jnp.max(jnp.abs(W_new))
        done = small | ~jnp.isfinite(jnp.max(jnp.abs(delta)))
        return (W_new, S_next, T_k @ T_k, it + 1, done)

    W, _, _, _, _ = jax.lax.while_loop(
        cond, body, (W0, S, T.T, jnp.asarray(0), jnp.asarray(False)))
    return W


@highest_precision
def _cr_bwd(tol, maxiter, residuals, cotangents):
    """Implicit adjoint.  With M = B + C T, solve the adjoint generalized
    Sylvester equation  Mᵀ W + Cᵀ W Tᵀ = T_bar  (Smith doubling, O(n³)),
    then  Ā = -W,  B̄ = -W Tᵀ,  C̄ = -W (Tᵀ)².
    """
    T_bar, _, _ = cotangents  # n_iter / best_crit carry no gradient
    B, C, T = residuals
    M = B + C @ T
    W = solve_adjoint_sylvester(M, C, T, T_bar)
    A_bar = -W
    B_bar = -W @ T.T
    C_bar = -W @ T.T @ T.T
    return (A_bar, B_bar, C_bar)


_cycle_reduction_T.defvjp(_cr_fwd, _cr_bwd)


def cycle_reduction(A, B, C, tol: float = 1e-12, maxiter: int = 100
                    ) -> CycleReductionResult:
    """Solve ``A + B T + C T² = 0`` for the minimal solvent.

    Differentiable (analytic implicit adjoint).  ``success`` is False when the
    iteration diverged (tails blew up — the pencil has no stable solvent, so
    any residual-consistent T it lands on is the explosive root) or the
    residual check fails.
    """
    T, n_iter, best_crit = _cycle_reduction_T(A, B, C, tol, maxiter)
    from .tolerances import success_tol

    thresh = success_tol(A.dtype, max(tol * 1e3, 1e-6))
    resid = _policy_residual_norm(A, B, C, jax.lax.stop_gradient(T))
    success = (best_crit < thresh) & jnp.isfinite(resid) & (resid < thresh)
    return CycleReductionResult(T, success, n_iter, resid)


@highest_precision
def selection_matrix(B, C, T, D):
    """Shock-impact matrix  R = -(B + C T)⁻¹ D.

    Role parity with ``gEconpy/solvers/shared.py:74``.  Batched-TPU-friendly
    Gauss-Jordan solve with the exact implicit-adjoint VJP.
    """
    return -gj_solve(B + C @ T, D)


def solve_policy_cycle_reduction(A, B, C, D, tol: float = 1e-12,
                                 maxiter: int = 100,
                                 stability_tol: float = 1e-6):
    """Full policy solve: returns (T, R, success, n_iter, resid_norm).

    ``success`` additionally requires the solvent to be stable (spectral
    radius < 1 + stability_tol) — a DSGE policy function must be
    non-explosive, matching the role of the reference's BK/solution checks.
    """
    from ..models.perturbation import spectral_radius

    res = cycle_reduction(A, B, C, tol=tol, maxiter=maxiter)
    R = selection_matrix(B, C, res.T, D)
    rho = spectral_radius(jax.lax.stop_gradient(res.T))
    stable = jnp.isfinite(rho) & (rho < 1.0 + stability_tol)
    success = res.success & stable & jnp.all(jnp.isfinite(R))
    return res.T, R, success, res.n_iter, res.resid_norm
