"""Steady-state solving: one jitted function per model.

Replaces the reference's scipy waterfall (``gEconpy/model/model.py:919``
steady_state: linear closed form -> analytic f_ss -> numeric root/minimize)
with a fully on-device pipeline: the analytic subset is evaluated directly,
the remaining unknowns (plus calibrated parameters) are solved by a jitted
damped-Newton/LM iteration in an unconstrained space (log/neg-log bijectors
from GCN assumptions).  The returned solver is ``vmap``-able over parameter
draws; failures surface as flags.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codegen.model_functions import ModelFunctions
from ..ops.implicit import implicit_root
from ..ops.tolerances import success_tol
from ..ops.newton import RootResult, levenberg_marquardt_solve, newton_solve

__all__ = ["SteadyStateSolution", "make_steady_state_solver",
           "make_fixed_value_solver"]


class SteadyStateSolution(NamedTuple):
    """Device-side steady-state result."""

    x_ss: jax.Array          # (n_variables,) steady-state values
    theta_full: jax.Array    # (P,) free ++ deterministic ++ calibrated
    success: jax.Array       # bool
    resid_norm: jax.Array    # inf-norm over ALL model equations
    n_iter: jax.Array


def make_steady_state_solver(
    mf: ModelFunctions,
    method: str = "hybrid",
    tol: float = 1e-8,
    maxiter: int = 500,
    default_guess: float = 0.8,
) -> Callable[..., SteadyStateSolution]:
    """Build ``solve(theta_free, x0=None) -> SteadyStateSolution``.

    ``x0`` optionally overrides the initial guess for the unknown block, in
    the *constrained* space, shape ``(n_unknown + n_calibrated,)``.
    """
    n = mf.n_variables
    n_unknown_vars = len(mf.unknown_idx)
    n_calib = len(mf.calibrated_params)
    n_u = n_unknown_vars + n_calib

    known_idx = jnp.asarray(mf.known_idx, dtype=jnp.int32)
    unknown_idx = jnp.asarray(mf.unknown_idx, dtype=jnp.int32)
    eq_unknown_idx = jnp.asarray(mf.eq_unknown_idx, dtype=jnp.int32)

    if len(mf.eq_unknown_idx) != n_unknown_vars:
        raise ValueError(
            f"steady-state system is not square after substituting the analytic "
            f"solution: {len(mf.eq_unknown_idx)} equations contain unknowns but "
            f"{n_unknown_vars} variables are unsolved. Check the STEADY_STATE block."
        )

    def assemble_theta(theta_fd: jax.Array, calib_vals: jax.Array) -> jax.Array:
        if n_calib:
            return jnp.concatenate([theta_fd, calib_vals])
        return theta_fd

    def assemble_x(theta_full: jax.Array, unknown_vals: jax.Array) -> jax.Array:
        x = jnp.zeros(n, dtype=theta_full.dtype)
        if len(mf.known_idx):
            x = x.at[known_idx].set(mf.f_ss_known(theta_full))
        if n_unknown_vars:
            x = x.at[unknown_idx].set(unknown_vals)
        return x

    def full_residual_norm(x: jax.Array, theta_full: jax.Array) -> jax.Array:
        r = mf.f_ss_resid(x, theta_full)
        if mf.f_calib_resid is not None:
            r = jnp.concatenate([r, mf.f_calib_resid(x, theta_full)])
        return jnp.max(jnp.abs(r))

    # ---------- fully analytic fast path -------------------------------------
    if n_u == 0:
        def solve_analytic(theta_free: jax.Array, x0=None) -> SteadyStateSolution:
            theta_full = mf.f_params(theta_free)
            x = assemble_x(theta_full, jnp.zeros((0,), theta_full.dtype))
            norm = full_residual_norm(x, theta_full)
            success = jnp.isfinite(norm) & (
                norm < success_tol(theta_full.dtype, max(tol, 1e-6)))
            return SteadyStateSolution(x, theta_full, success, norm,
                                       jnp.asarray(0))

        return solve_analytic

    # ---------- numeric path ---------------------------------------------------
    bijector = mf.bijector

    def unknown_residual(u: jax.Array, theta_fd: jax.Array) -> jax.Array:
        vals = bijector.forward(u)
        unknown_vals = vals[:n_unknown_vars]
        calib_vals = vals[n_unknown_vars:]
        theta_full = assemble_theta(theta_fd, calib_vals)
        x = assemble_x(theta_full, unknown_vals)
        r = mf.f_ss_resid(x, theta_full)[eq_unknown_idx]
        if mf.f_calib_resid is not None:
            r = jnp.concatenate([r, mf.f_calib_resid(x, theta_full)])
        return r

    def _run_solver(u0: jax.Array, theta_fd: jax.Array):
        """(u0, theta) -> (u_star, aux).  Wrapped in implicit_root below so
        gradients flow via the implicit function theorem instead of
        differentiating through the while_loop iterations."""
        if method == "newton":
            res = newton_solve(unknown_residual, u0, (theta_fd,), tol=tol,
                               maxiter=maxiter)
        elif method == "lm":
            res = levenberg_marquardt_solve(unknown_residual, u0, (theta_fd,),
                                            tol=tol, maxiter=maxiter)
        elif method in ("newton_nm", "chord", "dogleg", "gauss_newton"):
            from ..ops.newton import root as _root_dispatch

            res = _root_dispatch(unknown_residual, u0, (theta_fd,),
                                 method=method, tol=tol, maxiter=maxiter)
        else:  # hybrid
            res_n = newton_solve(unknown_residual, u0, (theta_fd,), tol=tol,
                                 maxiter=maxiter)
            res_lm = levenberg_marquardt_solve(
                unknown_residual, u0, (theta_fd,), tol=tol, maxiter=2 * maxiter)
            pick = res_n.success
            res = RootResult(
                jnp.where(pick, res_n.x, res_lm.x),
                pick | res_lm.success,
                jnp.where(pick, res_n.norm, res_lm.norm),
                jnp.where(pick, res_n.n_iter, res_lm.n_iter),
                res_n.n_feval + res_lm.n_feval,
            )
        return res.x, (res.success, res.norm, res.n_iter)

    _implicit_solve = implicit_root(unknown_residual, _run_solver)

    def solve_numeric(theta_free: jax.Array, x0: jax.Array | None = None
                      ) -> SteadyStateSolution:
        theta_fd = mf.f_params(theta_free)
        dtype = theta_fd.dtype
        if x0 is None:
            x0_c = jnp.full((n_u,), default_guess, dtype=dtype)
        else:
            x0_c = jnp.asarray(x0, dtype=dtype)
        u0 = bijector.inverse(x0_c)

        u_star, (succ, _norm, n_iter) = _implicit_solve(u0, theta_fd)
        res = RootResult(u_star, succ, _norm, n_iter, n_iter)

        vals = bijector.forward(res.x)
        unknown_vals = vals[:n_unknown_vars]
        calib_vals = vals[n_unknown_vars:]
        theta_full = assemble_theta(theta_fd, calib_vals)
        x = assemble_x(theta_full, unknown_vals)
        norm = full_residual_norm(x, theta_full)
        success = res.success & jnp.isfinite(norm) & (
            norm < success_tol(dtype, max(tol * 100, 1e-6)))
        return SteadyStateSolution(x, theta_full, success, norm, res.n_iter)

    return solve_numeric


def make_fixed_value_solver(mf: ModelFunctions, fixed_names: list[str],
                            method: str = "hybrid", tol: float = 1e-8,
                            maxiter: int = 500, default_guess: float = 0.8):
    """Steady-state solver with user-pinned values.

    Role parity with the reference's partial user-fixed steady state
    (``gEconpy/model/model.py:1097`` _build_resid_with_fixed_values and
    ``:1136`` _validate_fixed_value_equations): variables named in
    ``fixed_names`` are held at caller-supplied values, the remaining
    unknowns are solved, and the final success flag validates the FULL
    system — an inconsistent fixed value surfaces as failure, not silence.

    Returns ``solve(theta_free, fixed_values: (len(fixed_names),))``.
    """
    import sympy  # noqa: F401  (host-side only)

    from ..symbolic import TimeAwareSymbol

    n = mf.n_variables
    names = mf.variable_names
    unknown_fixed = set(fixed_names) - set(names)
    if unknown_fixed:
        raise KeyError(f"fixed_values name(s) not in model: {sorted(unknown_fixed)}")

    fixed_idx = np.asarray([names.index(f) for f in fixed_names], dtype=np.int64)
    known_set = set(mf.known_idx.tolist()) | set(fixed_idx.tolist())
    unknown_idx = np.asarray([i for i in range(n) if i not in known_set],
                             dtype=np.int64)
    n_calib = len(mf.calibrated_params)

    # equations still containing an unknown (structural, host-side).  The
    # lowered f_ss_resid has no symbolic info, so reuse the incidence baked
    # into eq_unknown_idx is not enough — recompute from variable presence in
    # each generated equation via the compiled source (cheap text scan of the
    # generated reads would be fragile; instead evaluate the Jacobian sparsity
    # numerically at a generic point).
    import jax as _jax

    probe_x = jnp.linspace(0.7, 1.3, n)
    probe_theta = jnp.linspace(0.4, 0.6, mf.n_params)
    J = _jax.jacfwd(mf.f_ss_resid)(probe_x, probe_theta)
    J = np.asarray(J)
    incidence = np.abs(J) > 1e-14
    eq_has_unknown = incidence[:, unknown_idx].any(axis=1) if len(unknown_idx) \
        else np.zeros(incidence.shape[0], dtype=bool)
    eq_sel = np.flatnonzero(eq_has_unknown)
    n_u = len(unknown_idx) + n_calib
    if len(eq_sel) < len(unknown_idx):
        raise ValueError(
            f"fixing {fixed_names} leaves {len(unknown_idx)} unknowns but only "
            f"{len(eq_sel)} equations contain them")
    # keep the system square: take the first len(unknown_idx) such equations
    eq_sel = eq_sel[:len(unknown_idx)]

    known_ana_idx = jnp.asarray(mf.known_idx, dtype=jnp.int32)
    fixed_idx_j = jnp.asarray(fixed_idx, dtype=jnp.int32)
    unknown_idx_j = jnp.asarray(unknown_idx, dtype=jnp.int32)
    eq_sel_j = jnp.asarray(eq_sel, dtype=jnp.int32)

    from ..ops.bijectors import make_bijector

    assumption_dicts = [dict(mf.variables[i].assumptions0) for i in unknown_idx]
    assumption_dicts += [dict(p.assumptions0) for p in mf.calibrated_params]
    bijector = make_bijector(assumption_dicts)

    def assemble(theta_fd, fixed_vals, u):
        vals = bijector.forward(u)
        unknown_vals = vals[:len(unknown_idx)]
        calib_vals = vals[len(unknown_idx):]
        theta_full = jnp.concatenate([theta_fd, calib_vals]) if n_calib \
            else theta_fd
        x = jnp.zeros(n, dtype=theta_fd.dtype)
        if len(mf.known_idx):
            x = x.at[known_ana_idx].set(mf.f_ss_known(theta_full))
        x = x.at[fixed_idx_j].set(fixed_vals)
        if len(unknown_idx):
            x = x.at[unknown_idx_j].set(unknown_vals)
        return x, theta_full

    def resid(u, args):
        theta_fd, fixed_vals = args
        x, theta_full = assemble(theta_fd, fixed_vals, u)
        r = mf.f_ss_resid(x, theta_full)[eq_sel_j]
        if mf.f_calib_resid is not None:
            r = jnp.concatenate([r, mf.f_calib_resid(x, theta_full)])
        return r

    def solve(theta_free, fixed_values):
        theta_fd = mf.f_params(theta_free)
        dtype = theta_fd.dtype
        fixed_vals = jnp.asarray(fixed_values, dtype=dtype)
        u0 = bijector.inverse(jnp.full((n_u,), default_guess, dtype=dtype))
        args = (theta_fd, fixed_vals)
        res = newton_solve(resid, u0, (args,), tol=tol, maxiter=maxiter)
        res_lm = levenberg_marquardt_solve(resid, u0, (args,), tol=tol,
                                           maxiter=2 * maxiter)
        pick = res.success
        u_star = jnp.where(pick, res.x, res_lm.x)
        x, theta_full = assemble(theta_fd, fixed_vals, u_star)
        # validate the FULL system, including equations resolved by the
        # fixed values — inconsistent pins fail here
        r_full = mf.f_ss_resid(x, theta_full)
        if mf.f_calib_resid is not None:
            r_full = jnp.concatenate([r_full, mf.f_calib_resid(x, theta_full)])
        norm = jnp.max(jnp.abs(r_full))
        from ..ops.tolerances import success_tol

        success = (pick | res_lm.success) & jnp.isfinite(norm) & (
            norm < success_tol(dtype, max(tol * 100, 1e-6)))
        return SteadyStateSolution(x, theta_full, success, norm,
                                   jnp.where(pick, res.n_iter, res_lm.n_iter))

    return solve
