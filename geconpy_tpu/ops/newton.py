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
           "dogleg_solve", "chord_solve", "gauss_newton_cg_solve",
           "newton_krylov_solve", "root"]


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
    memory: int = 1,
) -> RootResult:
    """Damped Newton with (non)monotone Armijo backtracking, fully on-device.

    ``f(x, *args) -> residual`` must be square.  The Jacobian comes from
    ``jax.jacfwd``.  A fixed-bound backtracking loop (``lax.scan`` with
    masking) keeps control flow XLA-compatible.

    ``memory > 1`` enables Grippo-Lampariello-Lucidi nonmonotone
    backtracking: a step is accepted against the MAX of the last ``memory``
    merit values, letting the iteration climb out of narrow curved valleys
    where monotone Armijo stalls (role parity with the reference's
    ``solvers/sparse_root/line_search.py`` NewtonNonmonotone:114).
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))
    jac = jax.jacfwd(f)
    memory = max(1, int(memory))

    def cond(state):
        x, r, hist, it, nfev, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, hist, it, nfev, done = state
        J = jac(x, *args)
        dx = jnp.linalg.solve(J, -r)
        # fall back to steepest descent direction if solve produced non-finite
        bad_dir = ~jnp.all(jnp.isfinite(dx))
        grad = J.T @ r
        dx = jnp.where(bad_dir, -grad, dx)

        m0 = 0.5 * jnp.dot(r, r)
        m_ref = jnp.max(hist)              # = m0 when memory == 1
        slope = jnp.dot(grad, dx)

        def backtrack(carry, i):
            alpha, best_x, best_r, best_m, accepted, nf = carry
            x_try = x + alpha * dx
            r_try = f(x_try, *args)
            m_try = 0.5 * jnp.dot(r_try, r_try)
            finite = jnp.all(jnp.isfinite(r_try))
            ok = finite & (m_try <= m_ref + armijo_c * alpha * slope) \
                & (~accepted)
            best_x = jnp.where(ok, x_try, best_x)
            best_r = jnp.where(ok, r_try, best_r)
            best_m = jnp.where(ok, m_try, best_m)
            accepted = accepted | ok
            return (alpha * 0.5, best_x, best_r, best_m, accepted, nf + (~accepted | ok)), None

        init = (jnp.asarray(1.0, x.dtype), x, r, m0, jnp.asarray(False), jnp.asarray(0))
        (alpha, x_new, r_new, m_new, accepted, nf), _ = jax.lax.scan(
            backtrack, init, jnp.arange(max_backtracks))

        hist_new = jnp.concatenate([hist[1:], m_new[None]]) if memory > 1 \
            else hist
        # if no step was accepted we are stuck: mark done (failure unless tol met)
        stuck = ~accepted
        converged = _inf_norm(r_new) < tol
        return (x_new, r_new, hist_new, it + 1, nfev + nf + 1,
                stuck | converged)

    r0 = f(x0, *args)
    m_init = 0.5 * jnp.dot(r0, r0)
    hist0 = jnp.full((memory,), m_init, x0.dtype)
    state0 = (x0, r0, hist0, jnp.asarray(0), jnp.asarray(1),
              jnp.asarray(_inf_norm(r0) < tol))
    x, r, hist, it, nfev, done = jax.lax.while_loop(cond, body, state0)
    norm = _inf_norm(r)
    success = jnp.isfinite(norm) & (norm < tol)
    return RootResult(x, success, norm, it, nfev)


@highest_precision
def chord_solve(
    f: Callable,
    x0: jax.Array,
    args: tuple = (),
    tol: float = 1e-8,
    maxiter: int = 200,
    refactor_ratio: float = 0.5,
) -> RootResult:
    """Chord (frozen-Jacobian) iteration with an automatic refactor trigger.

    The LU factorization of the Jacobian is reused across steps — each
    iteration is one residual evaluation plus two triangular solves — and
    the Jacobian is refactored only when the merit contraction per step is
    worse than ``refactor_ratio`` (role parity with the reference's
    ``solvers/sparse_root/direction.py:55`` Chord strategy).  Much cheaper
    per iteration than Newton when the Jacobian is expensive and the
    iterate is in the locally-linear regime.
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))
    jac = jax.jacfwd(f)

    def factor(x):
        return jax.scipy.linalg.lu_factor(jac(x, *args))

    def cond(state):
        x, r, lu, piv, fresh, it, njac, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, lu, piv, fresh, it, njac, done = state
        dx = jax.scipy.linalg.lu_solve((lu, piv), -r)
        m0 = jnp.dot(r, r)

        # halving line search along the frozen-Jacobian direction
        def backtrack(carry, _):
            alpha, bx, br, bm, acc = carry
            x_t = x + alpha * dx
            r_t = f(x_t, *args)
            m_t = jnp.dot(r_t, r_t)
            ok = jnp.all(jnp.isfinite(r_t)) & (m_t < m0) & (~acc)
            return (alpha * 0.5, jnp.where(ok, x_t, bx),
                    jnp.where(ok, r_t, br), jnp.where(ok, m_t, bm),
                    acc | ok), None

        (_, x_try, r_try, m_try, improved), _ = jax.lax.scan(
            backtrack, (jnp.asarray(1.0, x.dtype), x, r, m0,
                        jnp.asarray(False)), None, length=16)

        # refactor when contraction is poor (or the step failed outright)
        refactor = (~improved) | (m_try > refactor_ratio * m0)
        lu_new, piv_new = jax.lax.cond(
            refactor,
            lambda _: factor(jnp.where(improved, x_try, x)),
            lambda _: (lu, piv), None)

        x_new = jnp.where(improved, x_try, x)
        r_new = jnp.where(improved, r_try, r)
        converged = _inf_norm(r_new) < tol
        # a failed step from a FRESH factorization means even Newton's own
        # damped direction no longer improves: give up (flags, not exceptions)
        stuck = (~improved) & fresh
        return (x_new, r_new, lu_new, piv_new, refactor, it + 1,
                njac + refactor.astype(njac.dtype), converged | stuck)

    r0 = f(x0, *args)
    lu0, piv0 = factor(x0)
    state0 = (x0, r0, lu0, piv0, jnp.asarray(True), jnp.asarray(0),
              jnp.asarray(1), jnp.asarray(_inf_norm(r0) < tol))
    x, r, lu, piv, fresh, it, njac, done = jax.lax.while_loop(
        cond, body, state0)
    norm = _inf_norm(r)
    success = jnp.isfinite(norm) & (norm < tol)
    return RootResult(x, success, norm, it, it + njac)


@highest_precision
def gauss_newton_cg_solve(
    f: Callable,
    x0: jax.Array,
    args: tuple = (),
    tol: float = 1e-8,
    maxiter: int = 200,
    cg_iters: int | None = None,
    trust_radius0: float = 1.0,
    max_radius: float = 100.0,
) -> RootResult:
    """Trust-region Gauss-Newton with a Steihaug-CG inner solve.

    The inner step minimizes the Gauss-Newton model 0.5||r + J p||² inside
    the trust region using conjugate gradients on JᵀJ — matrix-free except
    for J itself (role parity with the reference's
    ``solvers/sparse_root/gauss_newton.py:9,74`` GaussNewtonTrustRegion).
    CG handles rank-deficient / rectangular-like Jacobians gracefully:
    it returns the Cauchy-like point where plain Newton would blow up.
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))
    jac = jax.jacfwd(f)
    n = x0.shape[0]
    if cg_iters is None:
        cg_iters = n

    def steihaug(J, g, radius):
        """CG on JᵀJ p = -g, truncated at the trust-region boundary."""
        def hvp(v):
            return J.T @ (J @ v)

        def to_boundary(p, d):
            # tau >= 0 with ||p + tau d|| = radius
            a = jnp.dot(d, d)
            b = 2.0 * jnp.dot(p, d)
            c = jnp.dot(p, p) - radius**2
            disc = jnp.maximum(b * b - 4 * a * c, 0.0)
            tau = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-300)
            return p + tau * d

        def body(carry, _):
            p, rr, d, done = carry
            Hd = hvp(d)
            dHd = jnp.dot(d, Hd)
            alpha = jnp.dot(rr, rr) / jnp.maximum(dHd, 1e-300)
            p_next = p + alpha * d
            hit = jnp.linalg.norm(p_next) >= radius
            neg_curv = dHd <= 0.0
            p_bound = to_boundary(p, d)
            p_new = jnp.where(done, p,
                              jnp.where(neg_curv | hit, p_bound, p_next))
            rr_new = jnp.where(done | neg_curv | hit, rr, rr - alpha * Hd)
            beta = jnp.dot(rr_new, rr_new) / jnp.maximum(jnp.dot(rr, rr),
                                                         1e-300)
            d_new = jnp.where(done | neg_curv | hit, d, rr_new + beta * d)
            small = jnp.linalg.norm(rr_new) < 1e-10
            return (p_new, rr_new, d_new, done | neg_curv | hit | small), None

        p0 = jnp.zeros_like(g)
        (p, _, _, _), _ = jax.lax.scan(
            body, (p0, -g, -g, jnp.asarray(False)), None, length=cg_iters)
        return p

    def cond(state):
        x, r, radius, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, radius, it, done = state
        J = jac(x, *args)
        g = J.T @ r
        step = steihaug(J, g, radius)

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


@highest_precision
def newton_krylov_solve(
    f: Callable,
    x0: jax.Array,
    args: tuple = (),
    tol: float = 1e-8,
    maxiter: int = 100,
    max_backtracks: int = 12,
    armijo_c: float = 1e-4,
    gmres_tol: float = 1e-4,
    gmres_restart: int = 30,
    gmres_maxiter: int = 4,
) -> RootResult:
    """Matrix-free inexact Newton-Krylov with Armijo backtracking.

    The Newton direction solves ``J dx = -r`` by GMRES whose matvec is one
    ``jax.jvp`` of the residual — the Jacobian is never materialized or
    factorized, so memory is O(dim x restart) and cost per inner iteration
    is one residual-tangent evaluation.  The right tool for very large
    stacked-time systems (perfect foresight at T >~ 512 on big models)
    where even the block-tridiagonal direct solve's (T, n, n) factor blocks
    dominate memory.  Role parity with the reference's
    ``InexactNewtonKrylov`` LGMRES direction
    (``gEconpy/solvers/sparse_root/direction.py:124``).

    ``gmres_tol`` is the inexact-Newton forcing term (relative residual of
    the inner solve); the steepest-descent fallback (via ``jax.vjp``) and
    the line search mirror :func:`newton_solve`.
    """
    import numpy as np

    tol = max(tol, 100 * float(np.finfo(np.dtype(x0.dtype)).eps))

    def cond(state):
        x, r, it, nfev, done = state
        return (~done) & (it < maxiter)

    def body(state):
        x, r, it, nfev, done = state

        def matvec(v):
            return jax.jvp(lambda xx: f(xx, *args), (x,), (v,))[1]

        dx, _ = jax.scipy.sparse.linalg.gmres(
            matvec, -r, tol=gmres_tol, atol=0.0,
            restart=min(gmres_restart, x.shape[0]),
            maxiter=gmres_maxiter, solve_method="batched")
        # fall back to steepest descent (J^T r via one vjp) on a failed
        # inner solve — same convention as newton_solve
        _, vjp_fn = jax.vjp(lambda xx: f(xx, *args), x)
        (grad,) = vjp_fn(r)
        bad_dir = ~jnp.all(jnp.isfinite(dx))
        dx = jnp.where(bad_dir, -grad, dx)

        m0 = 0.5 * jnp.dot(r, r)
        slope = jnp.dot(grad, dx)

        def backtrack(carry, _):
            alpha, best_x, best_r, accepted, nf = carry
            x_try = x + alpha * dx
            r_try = f(x_try, *args)
            m_try = 0.5 * jnp.dot(r_try, r_try)
            ok = jnp.all(jnp.isfinite(r_try)) \
                & (m_try <= m0 + armijo_c * alpha * slope) & (~accepted)
            best_x = jnp.where(ok, x_try, best_x)
            best_r = jnp.where(ok, r_try, best_r)
            return (alpha * 0.5, best_x, best_r, accepted | ok, nf + 1), None

        init = (jnp.asarray(1.0, x.dtype), x, r, jnp.asarray(False),
                jnp.asarray(0))
        (_, x_new, r_new, accepted, nf), _ = jax.lax.scan(
            backtrack, init, None, length=max_backtracks)
        converged = _inf_norm(r_new) < tol
        return (x_new, r_new, it + 1, nfev + nf + 1,
                (~accepted) | converged)

    r0 = f(x0, *args)
    state0 = (x0, r0, jnp.asarray(0), jnp.asarray(1),
              jnp.asarray(_inf_norm(r0) < tol))
    x, r, it, nfev, _ = jax.lax.while_loop(cond, body, state0)
    norm = _inf_norm(r)
    success = jnp.isfinite(norm) & (norm < tol)
    return RootResult(x, success, norm, it, nfev)


@partial(jax.jit, static_argnames=("f", "method", "tol", "maxiter"))
def root(f, x0, args=(), method: str = "newton", tol: float = 1e-8,
         maxiter: int = 100) -> RootResult:
    """Dispatching root-finder.  ``method`` in {'newton', 'newton_nm',
    'chord', 'lm', 'dogleg', 'gauss_newton', 'newton_krylov', 'hybrid'}.

    'hybrid' runs Newton and falls back to LM when Newton fails — both
    branches trace (XLA dead-code-eliminates nothing here, but steady-state
    systems are small so the extra trace is cheap and the behavior is
    vmap-safe).
    """
    if method == "newton":
        return newton_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "newton_nm":
        return newton_solve(f, x0, args, tol=tol, maxiter=maxiter, memory=5)
    if method == "chord":
        return chord_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "lm":
        return levenberg_marquardt_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "dogleg":
        return dogleg_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "gauss_newton":
        return gauss_newton_cg_solve(f, x0, args, tol=tol, maxiter=maxiter)
    if method == "newton_krylov":
        return newton_krylov_solve(f, x0, args, tol=tol, maxiter=maxiter)
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
