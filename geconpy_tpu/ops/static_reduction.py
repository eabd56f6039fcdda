"""Static-variable elimination before the policy solve.

Role parity with the reference's DROrder block-triangular permutation
(``gEconpy/model/model.py:172-250``) and Dynare's static/dynamic split: a
variable that appears neither lagged nor led ("static") contributes zero
columns to A and C, so a QR row transformation of B's static columns splits
the system into

    [ R_s  * ] [ s_t ]     top rows:    back out statics from dynamics
    [ 0    * ] [ d_t ] ... bottom rows: a pure quadratic pencil in d only

and the cycle-reduction / gensys solve runs on the n_d-dimensional dynamic
core — an (n/n_d)^3 saving on the dominant kernel.  For SW-2007 this cuts
the pencil from 33 to 23 variables.

The split indices are *structural* (symbolic incidence, fixed at build), so
everything stays static-shaped, jittable, and vmappable; the reduction is
exact (validated to ~1e-10 against the unreduced solve).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cycle_reduction import cycle_reduction, selection_matrix
from .precision import highest_precision

__all__ = ["StaticReduction", "ReducedPencil", "plan_static_reduction",
           "reduce_pencil", "policy_from_reduced", "expand_reduced_policy",
           "finalize_reduced_policy", "solve_policy_reduced"]


class StaticReduction(NamedTuple):
    static_idx: np.ndarray     # variable indices with no lag and no lead
    dynamic_idx: np.ndarray


def plan_static_reduction(equations, variables) -> StaticReduction:
    """Classify variables by structural incidence (host-side, build time)."""
    from ..models.timing import structural_incidence

    inc = structural_incidence(equations, variables)
    has_lag = inc["lag"].any(axis=0)
    has_lead = inc["lead"].any(axis=0)
    static = np.flatnonzero(~has_lag & ~has_lead)
    dynamic = np.flatnonzero(has_lag | has_lead)
    return StaticReduction(static, dynamic)


@jax.custom_vjp
def _implicit_policy_T(A, B, C, T_primal):
    """Identity on ``T_primal`` whose VJP is the full-system implicit adjoint
    of  A + B T + C T² = 0  — the complete-QR row transform used by the
    reduced primal has no JAX derivative, and differentiating through it
    would be wasteful anyway."""
    return T_primal


def _ipt_fwd(A, B, C, T_primal):
    return T_primal, (B, C, T_primal)


@highest_precision
def _ipt_bwd(residuals, T_bar):
    from .cycle_reduction import solve_adjoint_sylvester

    B, C, T = residuals
    M = B + C @ T
    # Mᵀ W + Cᵀ W Tᵀ = T_bar  via Smith doubling (as in cycle_reduction)
    W = solve_adjoint_sylvester(M, C, T, T_bar)
    return (-W, -W @ T.T, -W @ T.T @ T.T, jnp.zeros_like(T))


_implicit_policy_T.defvjp(_ipt_fwd, _ipt_bwd)


class ReducedPencil(NamedTuple):
    """Row-transformed pencil split into static (1) and dynamic (2) rows."""
    A2: jax.Array     # (n_d, n_d) pure dynamic quadratic pencil
    B2: jax.Array
    C2: jax.Array
    A1: jax.Array     # (n_s, n_d) rows that back out the statics
    B1: jax.Array
    C1: jax.Array
    R_s: jax.Array    # (n_s, n_s) upper-triangular static leading block
    D2: jax.Array | None = None   # transformed shock loadings (dynamic rows)
    D1: jax.Array | None = None   # transformed shock loadings (static rows)


@highest_precision
def reduce_pencil(A, B, C, plan: StaticReduction, D=None) -> ReducedPencil:
    """Complete-QR row transform eliminating the static columns (primal
    only — no JAX derivative; callers stop_gradient the inputs)."""
    s_idx = jnp.asarray(plan.static_idx, dtype=jnp.int32)
    d_idx = jnp.asarray(plan.dynamic_idx, dtype=jnp.int32)
    n_s = len(plan.static_idx)

    B_stat = B[:, s_idx]                              # (n, n_s)
    # QR of the static columns: Q^T B_s = [R_s; 0]
    Q, R_full = jnp.linalg.qr(B_stat, mode="complete")  # Q (n,n), R (n,n_s)
    R_s = R_full[:n_s, :]                             # (n_s, n_s) upper tri
    Qt = Q.T

    A_d = Qt @ A[:, d_idx]                            # (n, n_d)
    B_d = Qt @ B[:, d_idx]
    C_d = Qt @ C[:, d_idx]
    if D is None:
        return ReducedPencil(A_d[n_s:], B_d[n_s:], C_d[n_s:],
                             A_d[:n_s], B_d[:n_s], C_d[:n_s], R_s)
    D_t = Qt @ D
    return ReducedPencil(A_d[n_s:], B_d[n_s:], C_d[n_s:],
                         A_d[:n_s], B_d[:n_s], C_d[:n_s], R_s,
                         D_t[n_s:], D_t[:n_s])


@highest_precision
def expand_reduced_policy(T_d, R_d, red: ReducedPencil,
                          plan: StaticReduction, n: int):
    """Scatter (T_d, R_d) from the dynamic core back to the full system,
    backing out the static rows of both the policy and selection matrices
    (the selection solve already happened on the reduced system)."""
    dtype = T_d.dtype
    s_idx = jnp.asarray(plan.static_idx, dtype=jnp.int32)
    d_idx = jnp.asarray(plan.dynamic_idx, dtype=jnp.int32)
    M1 = red.B1 + red.C1 @ T_d
    # statics: R_s s_t = -(A1 d_{t-1} + M1 d_t + D1 eps),
    #          d_t = T_d d_{t-1} + R_d eps
    T_s = -jax.scipy.linalg.solve_triangular(red.R_s, red.A1 + M1 @ T_d,
                                             lower=False)
    R_s_rows = -jax.scipy.linalg.solve_triangular(red.R_s,
                                                  M1 @ R_d + red.D1,
                                                  lower=False)
    T = jnp.zeros((n, n), dtype)
    T = T.at[jnp.ix_(d_idx, d_idx)].set(T_d)
    T = T.at[jnp.ix_(s_idx, d_idx)].set(T_s)
    R = jnp.zeros((n, R_d.shape[1]), dtype)
    R = R.at[d_idx, :].set(R_d)
    R = R.at[s_idx, :].set(R_s_rows)
    return T, R


@highest_precision
def policy_from_reduced(T_d, red: ReducedPencil, plan: StaticReduction,
                        n: int):
    """Back out statics and scatter T_d into the original variable order."""
    dtype = T_d.dtype
    s_idx = jnp.asarray(plan.static_idx, dtype=jnp.int32)
    d_idx = jnp.asarray(plan.dynamic_idx, dtype=jnp.int32)
    # statics: R_s s_t = -(A1 d_{t-1} + (B1 + C1 T_d) d_t + D1 eps)
    M = red.B1 + red.C1 @ T_d
    T_s = -jax.scipy.linalg.solve_triangular(red.R_s, red.A1 + M @ T_d,
                                             lower=False)
    # scatter back to the original ordering; static columns are zero
    T = jnp.zeros((n, n), dtype)
    T = T.at[jnp.ix_(d_idx, d_idx)].set(T_d)
    T = T.at[jnp.ix_(s_idx, d_idx)].set(T_s)
    return T


@highest_precision
def finalize_reduced_policy(A, B, C, D, T, T_d, cr_success,
                            tol: float = 1e-12):
    """Full-system gradient re-attachment, selection matrix, and success
    flag shared by the XLA and Pallas reduced policy solves."""
    dtype = A.dtype
    As, Bs, Cs = (jax.lax.stop_gradient(m) for m in (A, B, C))
    # re-attach gradients: T via the full-system implicit adjoint, R through
    # the (differentiable) full-system selection solve
    T = _implicit_policy_T(A, B, C, T)
    R = selection_matrix(B, C, T, D)

    from ..models.perturbation import spectral_radius

    rho = spectral_radius(jax.lax.stop_gradient(T_d))
    stable = jnp.isfinite(rho) & (rho < 1.0 + 1e-6)
    Tsg = jax.lax.stop_gradient(T)
    resid = jnp.max(jnp.abs(As + Bs @ Tsg + Cs @ Tsg @ Tsg))
    from .tolerances import success_tol

    success = cr_success & stable & jnp.isfinite(resid) & (
        resid < success_tol(dtype, max(tol * 1e3, 1e-6))) \
        & jnp.all(jnp.isfinite(R))
    return T, R, success, resid


@highest_precision
def solve_policy_reduced(A, B, C, D, plan: StaticReduction,
                         tol: float = 1e-12, maxiter: int = 100):
    """Policy solve with the static block eliminated.

    Returns (T, R, success, n_iter, resid_norm) in the ORIGINAL variable
    ordering, identical to ``solve_policy_cycle_reduction`` applied to the
    full system.  Gradients attach at the full-system level (implicit
    adjoint), so the non-differentiable complete-QR transform stays in the
    primal only.
    """
    n = A.shape[0]
    n_s = len(plan.static_idx)

    if n_s == 0:
        from .cycle_reduction import solve_policy_cycle_reduction

        return solve_policy_cycle_reduction(A, B, C, D, tol=tol,
                                            maxiter=maxiter)

    # the reduced computation is primal-only; gradients re-attach below
    As, Bs, Cs = (jax.lax.stop_gradient(m) for m in (A, B, C))
    red = reduce_pencil(As, Bs, Cs, plan)
    cr = cycle_reduction(red.A2, red.B2, red.C2, tol=tol, maxiter=maxiter)
    T = policy_from_reduced(cr.T, red, plan, n)
    T, R, success, resid = finalize_reduced_policy(
        A, B, C, D, T, cr.T, cr.success, tol=tol)
    return T, R, success, cr.n_iter, resid
