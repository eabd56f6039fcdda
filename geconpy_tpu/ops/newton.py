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

__all__ = ["RootResult", "newton_solve", "levenberg_marquardt_solve",
           "dogleg_solve", "root"]


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


@highest_precision
def dogleg_solve(
    f: Callable,
    x0: jax.Array,
    args: tuple = (),
    tol: float = 1e-8,
    maxiter: int = 200,
    trust_radius0: float = 1.0,
    max_radius: float = 100.0,
) -> RootResult:
    """Powell dogleg trust-region root-finder (Gauss-Newton model).

    Role parity with the reference's sparse trust-region family
    (``gEconpy/solvers/sparse_root/dogleg.py:13`` SparseDogleg and
    ``gauss_newton.py:9``): minimizes 0.5||f||^2 within an adaptive trust
    region, stepping along the classic dogleg path between the Cauchy point
    and the Gauss-Newton point.  Same device-side control-flow guarantees as
    :func:`newton_solve` (one ``lax.while_loop``, flags not exceptions).
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))
    jac = jax.jacfwd(f)

    def cond(state):
        x, r, radius, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, radius, it, done = state
        J = jac(x, *args)
        g = J.T @ r                                     # gradient of merit
        gn = jnp.linalg.solve(J, -r)                    # Gauss-Newton step
        gn_bad = ~jnp.all(jnp.isfinite(gn))
        gn = jnp.where(gn_bad, -g, gn)
        gn_norm = jnp.linalg.norm(gn)

        # Cauchy point: steepest descent minimizer of the quadratic model
        Jg = J @ g
        denom = jnp.maximum(jnp.dot(Jg, Jg), 1e-300)
        t_c = jnp.dot(g, g) / denom
        cauchy = -t_c * g
        c_norm = jnp.linalg.norm(cauchy)

        # dogleg path selection
        def full_gn(_):
            return gn

        def clipped(_):
            def cauchy_clip(_):
                return cauchy * (radius / jnp.maximum(c_norm, 1e-300))

            def dogleg_seg(_):
                d = gn - cauchy
                a = jnp.dot(d, d)
                b = 2.0 * jnp.dot(cauchy, d)
                c = jnp.dot(cauchy, cauchy) - radius**2
                disc = jnp.maximum(b * b - 4 * a * c, 0.0)
                tau = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-300)
                return cauchy + tau * d

            return jax.lax.cond(c_norm >= radius, cauchy_clip, dogleg_seg,
                                None)

        step = jax.lax.cond(gn_norm <= radius, full_gn, clipped, None)

        # actual vs predicted reduction
        r_try = f(x + step, *args)
        finite = jnp.all(jnp.isfinite(r_try))
        actual = 0.5 * (jnp.dot(r, r) - jnp.dot(r_try, r_try))
        pred_vec = r + J @ step
        predicted = 0.5 * (jnp.dot(r, r) - jnp.dot(pred_vec, pred_vec))
        rho_tr = actual / jnp.maximum(predicted, 1e-300)

        accept = finite & (rho_tr > 0.05)
        x_new = jnp.where(accept, x + step, x)
        r_new = jnp.where(accept, r_try, r)
        step_norm = jnp.linalg.norm(step)
        # grow only when the model is good AND the step hit the boundary
        grow = (rho_tr > 0.75) & (step_norm >= 0.8 * radius) & finite
        shrink = (~finite) | (rho_tr < 0.25)
        radius_new = jnp.where(grow, jnp.minimum(2.0 * radius, max_radius),
                               jnp.where(shrink, 0.25 * step_norm + 1e-14,
                                         radius))
        radius_new = jnp.maximum(radius_new, 1e-12)

        converged = _inf_norm(r_new) < tol
        stuck = radius_new <= 1e-11
        return (x_new, r_new, radius_new, it + 1, converged | stuck)

    r0 = f(x0, *args)
    state0 = (x0, r0, jnp.asarray(trust_radius0, x0.dtype), jnp.asarray(0),
              jnp.asarray(_inf_norm(r0) < tol))
    x, r, radius, it, done = jax.lax.while_loop(cond, body, state0)
    norm = _inf_norm(r)
    success = jnp.isfinite(norm) & (norm < tol)
    return RootResult(x, success, norm, it, it)


@partial(jax.jit, static_argnames=("f", "method", "tol", "maxiter"))
def root(f, x0, args=(), method: str = "newton", tol: float = 1e-8,
         maxiter: int = 100) -> RootResult:
    """Dispatching root-finder.  ``method`` in {'newton', 'lm', 'dogleg',
    'hybrid'}.

    'hybrid' runs Newton and falls back to LM when Newton fails — both
    branches trace (XLA dead-code-eliminates nothing here, but steady-state
    systems are small so the extra trace is cheap and the behavior is
    vmap-safe).
    """
    if method == "newton":
        return newton_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "lm":
        return levenberg_marquardt_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "dogleg":
        return dogleg_solve(f, x0, args, tol=tol, maxiter=maxiter)
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
