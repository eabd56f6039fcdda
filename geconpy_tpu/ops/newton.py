"""Jitted root-finding kernels for steady-state solving.

Replaces the reference's scipy-driven steady-state path
(``gEconpy/model/model.py:1192`` root / ``:1241`` minimize via
better_optimize): the entire Newton / Levenberg-Marquardt iteration runs as a
single ``lax.while_loop`` on device, with static iteration bounds, so it is
``jit``-able and ``vmap``-able over parameter draws (per-draw failures become
success flags, never exceptions — required for batched estimation).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["RootResult", "newton_solve", "levenberg_marquardt_solve", "root"]


class RootResult(NamedTuple):
    x: jax.Array
    success: jax.Array        # bool
    norm: jax.Array           # final residual inf-norm
    n_iter: jax.Array         # iterations used
    n_feval: jax.Array


def _inf_norm(r):
    return jnp.max(jnp.abs(r))


@highest_precision
def newton_solve(
    f: Callable,
    x0: jax.Array,
    args: tuple = (),
    tol: float = 1e-8,
    maxiter: int = 100,
    max_backtracks: int = 12,
    armijo_c: float = 1e-4,
) -> RootResult:
    """Damped Newton with Armijo backtracking, fully on-device.

    ``f(x, *args) -> residual`` must be square.  The Jacobian comes from
    ``jax.jacfwd``.  A fixed-bound backtracking loop (``fori_loop`` with
    masking) keeps control flow XLA-compatible.
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))
    jac = jax.jacfwd(f)

    def merit(x):
        r = f(x, *args)
        return 0.5 * jnp.dot(r, r), r

    def cond(state):
        x, r, it, nfev, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, it, nfev, done = state
        J = jac(x, *args)
        dx = jnp.linalg.solve(J, -r)
        # fall back to steepest descent direction if solve produced non-finite
        bad_dir = ~jnp.all(jnp.isfinite(dx))
        grad = J.T @ r
        dx = jnp.where(bad_dir, -grad, dx)

        m0 = 0.5 * jnp.dot(r, r)
        slope = jnp.dot(grad, dx)

        def backtrack(carry, i):
            alpha, best_x, best_r, best_m, accepted, nf = carry
            x_try = x + alpha * dx
            r_try = f(x_try, *args)
            m_try = 0.5 * jnp.dot(r_try, r_try)
            finite = jnp.all(jnp.isfinite(r_try))
            ok = finite & (m_try <= m0 + armijo_c * alpha * slope) & (~accepted)
            best_x = jnp.where(ok, x_try, best_x)
            best_r = jnp.where(ok, r_try, best_r)
            best_m = jnp.where(ok, m_try, best_m)
            accepted = accepted | ok
            return (alpha * 0.5, best_x, best_r, best_m, accepted, nf + (~accepted | ok)), None

        init = (jnp.asarray(1.0, x.dtype), x, r, m0, jnp.asarray(False), jnp.asarray(0))
        (alpha, x_new, r_new, m_new, accepted, nf), _ = jax.lax.scan(
            backtrack, init, jnp.arange(max_backtracks))

        # if no step was accepted we are stuck: mark done (failure unless tol met)
        stuck = ~accepted
        converged = _inf_norm(r_new) < tol
        return (x_new, r_new, it + 1, nfev + nf + 1, stuck | converged)

    r0 = f(x0, *args)
    state0 = (x0, r0, jnp.asarray(0), jnp.asarray(1),
              jnp.asarray(_inf_norm(r0) < tol))
    x, r, it, nfev, done = jax.lax.while_loop(cond, body, state0)
    norm = _inf_norm(r)
    success = jnp.isfinite(norm) & (norm < tol)
    return RootResult(x, success, norm, it, nfev)


@highest_precision
def levenberg_marquardt_solve(
    f: Callable,
    x0: jax.Array,
    args: tuple = (),
    tol: float = 1e-8,
    maxiter: int = 200,
    mu0: float = 1e-3,
    mu_inc: float = 10.0,
    mu_dec: float = 0.2,
    mu_max: float = 1e12,
) -> RootResult:
    """Levenberg-Marquardt for stiff / ill-conditioned steady states.

    Solves ``(JᵀJ + mu·diag(JᵀJ)) dx = -Jᵀr`` with multiplicative damping
    adaptation.  Same device-side control-flow guarantees as
    :func:`newton_solve`.
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))
    jac = jax.jacfwd(f)

    def cond(state):
        x, r, mu, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, mu, it, done = state
        J = jac(x, *args)
        JtJ = J.T @ J
        g = J.T @ r
        d = jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-12))
        dx = jnp.linalg.solve(JtJ + mu * d, -g)
        x_try = x + dx
        r_try = f(x_try, *args)
        m0 = jnp.dot(r, r)
        m_try = jnp.dot(r_try, r_try)
        improved = jnp.all(jnp.isfinite(r_try)) & (m_try < m0)

        x_new = jnp.where(improved, x_try, x)
        r_new = jnp.where(improved, r_try, r)
        mu_new = jnp.where(improved, jnp.maximum(mu * mu_dec, 1e-16),
                           jnp.minimum(mu * mu_inc, mu_max))
        converged = _inf_norm(r_new) < tol
        stuck = (~improved) & (mu >= mu_max)
        return (x_new, r_new, mu_new, it + 1, converged | stuck)

    r0 = f(x0, *args)
    state0 = (x0, r0, jnp.asarray(mu0, x0.dtype), jnp.asarray(0),
              jnp.asarray(_inf_norm(r0) < tol))
    x, r, mu, it, done = jax.lax.while_loop(cond, body, state0)
    norm = _inf_norm(r)
    success = jnp.isfinite(norm) & (norm < tol)
    return RootResult(x, success, norm, it, it)


@partial(jax.jit, static_argnames=("f", "method", "tol", "maxiter"))
def root(f, x0, args=(), method: str = "newton", tol: float = 1e-8,
         maxiter: int = 100) -> RootResult:
    """Dispatching root-finder.  ``method`` in {'newton', 'lm', 'hybrid'}.

    'hybrid' runs Newton and falls back to LM when Newton fails — both
    branches trace (XLA dead-code-eliminates nothing here, but steady-state
    systems are small so the extra trace is cheap and the behavior is
    vmap-safe).
    """
    if method == "newton":
        return newton_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "lm":
        return levenberg_marquardt_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "hybrid":
        res_n = newton_solve(f, x0, args, tol=tol, maxiter=maxiter)
        res_lm = levenberg_marquardt_solve(f, x0, args, tol=tol, maxiter=2 * maxiter)
        pick = res_n.success
        return RootResult(
            jnp.where(pick, res_n.x, res_lm.x),
            pick | res_lm.success,
            jnp.where(pick, res_n.norm, res_lm.norm),
            jnp.where(pick, res_n.n_iter, res_lm.n_iter),
            res_n.n_feval + res_lm.n_feval,
        )
    raise ValueError(f"unknown method {method!r}")
