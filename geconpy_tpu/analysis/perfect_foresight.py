"""Deterministic (perfect-foresight) nonlinear trajectory solver.

Role parity with ``gEconpy/model/perfect_foresight/`` (solve.py:283
solve_perfect_foresight, compile.py:282, assemble.py:8) and the
``solvers/sparse_root`` Newton family it drives.

TPU-first design: the stacked-time system F(y_{t-1}, y_t, y_{t+1}, eps_t) = 0
for t=1..T (boundary y_0, y_{T+1} fixed at initial/terminal steady states) is
solved by a damped Newton iteration in which

- the T per-period residuals and the three Jacobian blocks come from ONE
  ``vmap`` of the lowered model function / its jacfwd (no per-period Python
  loop),
- each Newton step solves the block-tridiagonal system with the scan-based
  block Thomas kernel (O(T n^3), on device, static shapes),
- Armijo backtracking uses the residual-only fast path (same trick as the
  reference's cheap merit function, ``solve.py:474-486``).

Supports shock paths, time-varying parameter paths, and permanent shocks
(different initial/terminal steady states with a piecewise initial guess).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.model import Model
from ..ops.block_tridiag import solve_block_tridiagonal
from ..ops.tolerances import success_tol

__all__ = ["solve_perfect_foresight", "PerfectForesightResult"]


class PerfectForesightResult(NamedTuple):
    trajectory: pd.DataFrame     # (T+2, n) incl. boundary rows
    success: bool
    n_iter: int
    resid_norm: float


def _stacked_solver(mf, periods: int, tol: float, maxiter: int,
                    max_backtracks: int = 10, direction: str = "direct"):
    f = mf.f_resid
    jac_lag = jax.jacfwd(f, argnums=0)
    jac_now = jax.jacfwd(f, argnums=1)
    jac_lead = jax.jacfwd(f, argnums=2)
    n = mf.n_variables

    def residuals(Y, y0, yT1, eps_path, theta_path):
        """Y: (T, n) unknowns.  Residual r[t] = F(y_{t-1}, y_t, y_{t+1});
        SS-symbol references resolve to the terminal steady state."""
        y_prev = jnp.concatenate([y0[None], Y[:-1]], axis=0)
        y_next = jnp.concatenate([Y[1:], yT1[None]], axis=0)
        x_ss_path = jnp.tile(yT1[None], (Y.shape[0], 1))
        return jax.vmap(f)(y_prev, Y, y_next, eps_path, x_ss_path, theta_path)

    def jacobian_blocks(Y, y0, yT1, eps_path, theta_path):
        y_prev = jnp.concatenate([y0[None], Y[:-1]], axis=0)
        y_next = jnp.concatenate([Y[1:], yT1[None]], axis=0)
        x_ss_path = jnp.tile(yT1[None], (Y.shape[0], 1))
        A = jax.vmap(jac_lag)(y_prev, Y, y_next, eps_path, x_ss_path, theta_path)
        B = jax.vmap(jac_now)(y_prev, Y, y_next, eps_path, x_ss_path, theta_path)
        C = jax.vmap(jac_lead)(y_prev, Y, y_next, eps_path, x_ss_path, theta_path)
        return A, B, C

    def solve(Y0, y0, yT1, eps_path, theta_path):
        # dtype-aware convergence: the caller's tol is the float64 target;
        # float32 paths (TPU, un-forced CPU) get ~1000*eps instead of an
        # unreachable 1e-8
        tol_eff = success_tol(Y0.dtype, base=tol)

        def norm(r):
            return jnp.max(jnp.abs(r))

        def cond(state):
            Y, r, it, done = state
            return (~done) & (it < maxiter)

        def direct_direction(Y, r):
            A, B, C = jacobian_blocks(Y, y0, yT1, eps_path, theta_path)
            # A[0] couples to fixed y0 (not an unknown): zero it; same C[T-1]
            A = A.at[0].set(jnp.zeros((n, n), A.dtype))
            C = C.at[-1].set(jnp.zeros((n, n), C.dtype))
            return solve_block_tridiagonal(A, B, C, -r)

        def krylov_direction(Y, r):
            # matrix-free GMRES on the stacked system: the matvec is one
            # jvp of the residual map, so the per-period Jacobian blocks are
            # never differentiated out or factorized (reference:
            # InexactNewtonKrylov LGMRES direction,
            # gEconpy/solvers/sparse_root/direction.py:124).  Unpreconditioned
            # restarted GMRES stagnates on stacked-time pencils, so the
            # CONSTANT steady-state blocks (one jacfwd at the terminal SS,
            # not T of them) precondition it via the same block-Thomas scan
            # — near the path the preconditioned operator is I + O(deviation)
            # and GMRES converges in a handful of iterations.
            T_len = Y.shape[0]
            zero_e = jnp.zeros((eps_path.shape[1],), Y.dtype)
            args_ss = (yT1, yT1, yT1, zero_e, yT1, theta_path[-1])
            A_ss = jac_lag(*args_ss)
            B_ss = jac_now(*args_ss)
            C_ss = jac_lead(*args_ss)
            zero_blk = jnp.zeros((n, n), Y.dtype)
            A_b = jnp.broadcast_to(A_ss, (T_len, n, n)).at[0].set(zero_blk)
            B_b = jnp.broadcast_to(B_ss, (T_len, n, n))
            C_b = jnp.broadcast_to(C_ss, (T_len, n, n)).at[-1].set(zero_blk)

            def matvec(v):
                V = v.reshape(Y.shape)
                tangent = jax.jvp(
                    lambda Y_: residuals(Y_, y0, yT1, eps_path, theta_path),
                    (Y,), (V,))[1]
                return tangent.ravel()

            def precond(v):
                V = v.reshape(Y.shape)
                return solve_block_tridiagonal(A_b, B_b, C_b, V).ravel()

            dy_flat, _ = jax.scipy.sparse.linalg.gmres(
                matvec, -r.ravel(), M=precond, tol=1e-8, atol=0.0,
                restart=20, maxiter=4, solve_method="batched")
            return dy_flat.reshape(Y.shape)

        def body(state):
            Y, r, it, done = state
            if direction == "krylov":
                dY = krylov_direction(Y, r)
            else:
                dY = direct_direction(Y, r)
            bad = ~jnp.all(jnp.isfinite(dY))
            dY = jnp.where(bad, jnp.zeros_like(dY), dY)

            m0 = norm(r)

            def backtrack(carry, _):
                alpha, best_Y, best_r, accepted = carry
                Y_try = Y + alpha * dY
                r_try = residuals(Y_try, y0, yT1, eps_path, theta_path)
                ok = jnp.all(jnp.isfinite(r_try)) & (norm(r_try) < m0) \
                    & (~accepted)
                best_Y = jnp.where(ok, Y_try, best_Y)
                best_r = jnp.where(ok, r_try, best_r)
                return (alpha * 0.5, best_Y, best_r, accepted | ok), None

            init = (jnp.asarray(1.0, Y.dtype), Y, r, jnp.asarray(False))
            (alpha, Y_new, r_new, accepted), _ = jax.lax.scan(
                backtrack, init, None, length=max_backtracks)
            converged = norm(r_new) < tol_eff
            return (Y_new, r_new, it + 1, converged | (~accepted) | bad)

        r0 = residuals(Y0, y0, yT1, eps_path, theta_path)
        state = (Y0, r0, jnp.asarray(0), jnp.asarray(norm(r0) < tol_eff))
        Y, r, it, _ = jax.lax.while_loop(cond, body, state)
        final_norm = norm(r)
        success = jnp.isfinite(final_norm) & (final_norm < tol_eff)
        return Y, success, it, final_norm

    return solve, residuals


def solve_perfect_foresight(
    model: Model,
    periods: int = 100,
    shocks: dict[str, np.ndarray] | None = None,
    initial_params: dict | None = None,
    terminal_params: dict | None = None,
    param_paths: dict[str, np.ndarray] | None = None,
    tol: float = 1e-8,
    maxiter: int = 100,
    initial_guess: str = "terminal",   # "terminal" | "linear" | "initial"
    direction: str = "direct",         # "direct" | "krylov"
) -> PerfectForesightResult:
    """Solve the nonlinear deterministic trajectory.

    - Temporary shocks: ``shocks={"epsilon_A": array}`` (padded/truncated to
      ``periods``); the economy starts and ends at the same steady state.
    - Permanent change: pass ``terminal_params`` differing from
      ``initial_params`` — boundaries use the two steady states and the
      terminal parameterization governs dynamics (announced-at-t0 change).
    - Time-varying parameters: ``param_paths={"name": array}`` overrides a
      free parameter along the transition (padded with its terminal value);
      the terminal steady state must be consistent with the path's end.
    - ``direction="krylov"`` computes each Newton step with matrix-free
      GMRES (one jvp per inner iteration) instead of the block-tridiagonal
      direct factorization — O(T n restart) memory, for horizons where the
      (T, n, n) factor blocks no longer fit.
    """
    mf = model.functions
    n = mf.n_variables
    k = mf.n_shocks

    theta0 = model.default_theta(**(initial_params or {}))
    theta1 = model.default_theta(**{**(initial_params or {}),
                                    **(terminal_params or {})})
    ss0 = model.ss_solver(theta0)
    ss1 = model.ss_solver(theta1)
    if not (bool(ss0.success) and bool(ss1.success)):
        raise RuntimeError("boundary steady state(s) failed to solve")

    eps_path = np.zeros((periods, k))
    if shocks:
        for name, path in shocks.items():
            if name not in mf.shock_names:
                raise KeyError(f"unknown shock {name!r}; shocks are "
                               f"{mf.shock_names}")
            j = mf.shock_names.index(name)
            path = np.asarray(path, dtype=float).ravel()
            m = min(len(path), periods)
            eps_path[:m, j] = path[:m]

    theta_path_np = np.tile(np.asarray(ss1.theta_full)[None, :], (periods, 1))
    if param_paths:
        free_names = [p_.name for p_ in mf.free_params]
        # theta_full layout: free ++ deterministic ++ calibrated; recompute
        # the free+deterministic block per period through f_params
        free_block = np.tile(np.asarray(model.default_theta(
            **{**(initial_params or {}), **(terminal_params or {})}))[None, :],
            (periods, 1))
        for name, path in param_paths.items():
            if name not in free_names:
                raise KeyError(f"unknown parameter {name!r} in param_paths")
            j = free_names.index(name)
            path = np.asarray(path, dtype=float).ravel()
            m = min(len(path), periods)
            free_block[:m, j] = path[:m]
            if m < periods:
                free_block[m:, j] = path[-1] if len(path) else free_block[m:, j]
        fd = np.asarray(jax.vmap(mf.f_params)(jnp.asarray(free_block)))
        theta_path_np[:, :fd.shape[1]] = fd
    theta_path = jnp.asarray(theta_path_np)

    x0_ss = ss0.x_ss
    xT_ss = ss1.x_ss
    if initial_guess == "terminal":
        Y0 = jnp.tile(xT_ss[None, :], (periods, 1))
    elif initial_guess == "initial":
        Y0 = jnp.tile(x0_ss[None, :], (periods, 1))
    else:  # linear interpolation between the two steady states
        w = jnp.linspace(0.0, 1.0, periods)[:, None]
        Y0 = (1 - w) * x0_ss[None, :] + w * xT_ss[None, :]

    solve, _ = _stacked_solver(mf, periods, tol, maxiter,
                               direction=direction)
    Y, success, n_iter, resid_norm = jax.jit(solve)(
        Y0, x0_ss, xT_ss, jnp.asarray(eps_path), theta_path)

    rows = np.vstack([np.asarray(x0_ss)[None], np.asarray(Y),
                      np.asarray(xT_ss)[None]])
    df = pd.DataFrame(rows, columns=mf.variable_names,
                      index=pd.RangeIndex(-1, periods + 1, name="time"))
    return PerfectForesightResult(df, bool(success), int(n_iter),
                                  float(resid_norm))
