"""Second-order perturbation solution (beyond reference parity).

The reference (gEconpy) is first-order only; this module extends the policy
function to second order in the Schmitt-Grohe/Uribe (2004) sense, designed
TPU-first end to end:

- **No symbolic second derivatives.**  The Hessian of the stacked residual
  F(y_{t-1}, y_t, y_{t+1}, eps) is obtained with nested ``jax.jacfwd`` on the
  lowered residual, composed with the (exp-)change of variables used by the
  first-order log-linearization — the exp curvature of log deviations is
  handled by autodiff, not hand-derived chain rules.
- **Generalized Sylvester by Smith doubling.**  The g_xx equation
  ``(B + C T) g_xx + C g_xx (T (x) T) = -K_xx`` is solved as the geometrically
  convergent series  Sum_j M^j X0 (T^j (x) T^j)  with M = -(B + C T)^{-1} C,
  accelerated by repeated squaring (the same structure as the first-order
  adjoint solver ``ops/cycle_reduction.py::solve_adjoint_sylvester``) — no
  Schur decomposition, no kron blow-up, O(n^4 log) work, fully jittable and
  vmappable.
- Cross (g_xu), shock (g_uu) and uncertainty (g_ss) blocks are direct linear
  solves once g_xx is known.
- Simulation/IRFs use the pruned state space of Kim-Kim-Schaumburg (2008),
  so second-order paths cannot explode spuriously.

Solution form (hat = first-order deviation coordinates: log deviation for
log-linearized variables, level deviation otherwise):

    y1_t = T y1_{t-1} + R eps_t
    y2_t = T y2_{t-1} + 1/2 G_xx (y1 (x) y1) + G_xu (y1 (x) eps)
                     + 1/2 G_uu (eps (x) eps) + 1/2 g_ss
    yhat_t = y1_t + y2_t
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codegen.model_functions import ModelFunctions
from ..ops.precision import highest_precision

__all__ = ["SecondOrderResult", "make_second_order_solver",
           "solve_quadratic_sylvester", "simulate_pruned",
           "second_order_mean", "irf_second_order", "generalized_irf"]

_ZERO_TOL = 1e-8


class SecondOrderResult(NamedTuple):
    G_xx: jax.Array    # (n, n, n)  d2 y / dx dx, symmetric in trailing axes
    G_xu: jax.Array    # (n, n, k)  d2 y / dx du
    G_uu: jax.Array    # (n, k, k)  d2 y / du du, symmetric
    g_ss: jax.Array    # (n,)       uncertainty correction (sigma-sigma term)
    success: jax.Array


@highest_precision
def _sqs_raw(A_l, C, T, K, n_iter: int = 30):
    n_eq = K.shape[0]
    X0 = -jnp.linalg.solve(A_l, K.reshape(n_eq, -1)).reshape(K.shape)
    M0 = -jnp.linalg.solve(A_l, C)

    def cond(carry):
        _, _, _, it, done = carry
        return (~done) & (it < n_iter)

    def body(carry):
        X, M, Tk, it, _ = carry
        delta = jnp.einsum("ia,ajk->ijk", M, X)
        delta = jnp.einsum("iab,aj,bk->ijk", delta, Tk, Tk)
        X_new = X + delta
        scale = jnp.maximum(jnp.max(jnp.abs(X_new)), 1e-30)
        small = jnp.max(jnp.abs(delta)) <= 10 * jnp.finfo(X.dtype).eps * scale
        finite = jnp.isfinite(jnp.max(jnp.abs(delta)))
        return (X_new, M @ M, Tk @ Tk, it + 1, small | ~finite)

    X, _, _, _, done = jax.lax.while_loop(
        cond, body, (X0, M0, T, jnp.asarray(0), jnp.asarray(False)))
    converged = done & jnp.all(jnp.isfinite(X))
    return X, converged


def _apply_tt(X, T):
    """X (T (x) T):  out[i,j,k] = X[i,a,b] T[a,j] T[b,k]."""
    return jnp.einsum("iab,aj,bk->ijk", X, T, T)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def solve_quadratic_sylvester(A_l, C, T, K, n_iter: int = 30):
    """Solve  A_l X + C X (T (x) T) = -K  for X of shape (n_eq, n, n).

    Smith-doubling on the series X = Sum_j M^j X0 (T^j (x) T^j) with
    M = -A_l^{-1} C, X0 = -A_l^{-1} K.  Converges iff rho(M) rho(T)^2 < 1,
    which holds for determinate models (rho(T) < 1 and M's spectrum is the
    reciprocal unstable spectrum of the pencil).  Returns (X, converged).

    Differentiable: the implicit-function adjoint is the transposed
    generalized Sylvester equation  A_l^T W + C^T W (T^T (x) T^T) = X_bar,
    solved by the same doubling — one extra O(n^4 log) solve per backward
    pass regardless of forward iteration count (the same structure as the
    first-order policy adjoint, ops/cycle_reduction.py::_cr_bwd).  This is
    what lets NUTS differentiate the second-order (UKF) likelihood
    (stats/nonlinear.py).
    """
    return _sqs_raw(A_l, C, T, K, n_iter)


def _sqs_fwd(A_l, C, T, K, n_iter):
    X, converged = _sqs_raw(A_l, C, T, K, n_iter)
    return (X, converged), (A_l, C, T, X)


@highest_precision
def _sqs_bwd(n_iter, residuals, cotangents):
    X_bar, _conv_bar = cotangents
    A_l, C, T, X = residuals
    # W solves the transposed system: reuse the doubling solver with
    # (A_l^T, C^T, T^T) and RHS -X_bar (the solver's sign convention)
    W, _ = _sqs_raw(A_l.T, C.T, T.T, -X_bar, n_iter)
    XT = _apply_tt(X, T)
    A_bar = -jnp.einsum("ijk,ajk->ia", W, X)
    C_bar = -jnp.einsum("ijk,ajk->ia", W, XT)
    CX = jnp.einsum("ic,cpq->ipq", C, X)
    T_bar = -(jnp.einsum("ijk,ipq,qk->pj", W, CX, T)
              + jnp.einsum("ijk,ipq,pj->qk", W, CX, T))
    K_bar = -W
    return (A_bar, C_bar, T_bar, K_bar)


solve_quadratic_sylvester.defvjp(_sqs_fwd, _sqs_bwd)


def make_second_order_solver(mf: ModelFunctions,
                             loglin_variables: list[str] | bool = True):
    """Build ``solve2(x_ss, theta_full, T, R, Q) -> SecondOrderResult``.

    ``loglin_variables`` must match the first-order linearization that
    produced T and R (``models/perturbation.py::make_linearizer``): hat
    coordinates are log deviations (y = y_ss exp(yhat)) for log-linearized
    variables and level deviations otherwise.
    """
    n = mf.n_variables
    k = mf.n_shocks
    if loglin_variables is True:
        loglin_mask = np.ones(n, dtype=bool)
    elif loglin_variables is False:
        loglin_mask = np.zeros(n, dtype=bool)
    else:
        requested = set(loglin_variables)
        unknown = requested - set(mf.variable_names)
        if unknown:
            raise ValueError(f"loglin_variables not in model: {sorted(unknown)}")
        loglin_mask = np.array([v in requested for v in mf.variable_names])
    loglin_mask_j = jnp.asarray(loglin_mask)
    f = mf.f_resid
    m = 3 * n + k

    @highest_precision
    def solve2(x_ss, theta_full, T, R, Q) -> SecondOrderResult:
        dtype = x_ss.dtype
        is_log = loglin_mask_j & (x_ss > _ZERO_TOL)

        def tx(yhat):
            # the same change of variables whose first derivative is the
            # loglin column scale of make_linearizer
            return jnp.where(is_log, x_ss * jnp.exp(yhat), x_ss + yhat)

        def resid_hat(w):
            ym, y0, yp, eps = w[:n], w[n:2 * n], w[2 * n:3 * n], w[3 * n:]
            return f(tx(ym), tx(y0), tx(yp), eps, x_ss, theta_full)

        w0 = jnp.zeros((m,), dtype)
        H = jax.jacfwd(jax.jacfwd(resid_hat))(w0)          # (n_eq, m, m)
        # first-order Jacobian blocks at the same point (consistent with the
        # policy matrices passed in)
        J = jax.jacfwd(resid_hat)(w0)                       # (n_eq, m)
        B = J[:, n:2 * n]
        C = J[:, 2 * n:3 * n]

        # first derivatives of each residual slot w.r.t. (x, u) = (n+k,)
        # slots: y_{t-1} -> [I, 0]; y_t -> [T, R]; y_{t+1} -> [TT, TR];
        # eps -> [0, I]
        eye_n = jnp.eye(n, dtype=dtype)
        eye_k = jnp.eye(k, dtype=dtype)
        zeros_nk = jnp.zeros((n, k), dtype)
        zeros_kn = jnp.zeros((k, n), dtype)
        P = jnp.concatenate([
            jnp.concatenate([eye_n, zeros_nk], axis=1),
            jnp.concatenate([T, R], axis=1),
            jnp.concatenate([T @ T, T @ R], axis=1),
            jnp.concatenate([zeros_kn, eye_k], axis=1),
        ], axis=0)                                          # (m, n+k)

        K_mm = jnp.einsum("ipq,pj,qk->ijk", H, P, P)        # (n_eq, n+k, n+k)
        K_xx = K_mm[:, :n, :n]
        K_xu = K_mm[:, :n, n:]
        K_uu = K_mm[:, n:, n:]

        A_l = B + C @ T
        G_xx, sylv_ok = solve_quadratic_sylvester(A_l, C, T, K_xx)
        G_xx = 0.5 * (G_xx + jnp.swapaxes(G_xx, 1, 2))

        # v_xu = G_xx (T (x) R) + T G_xu  ->  A_l G_xu = -(K_xu + C Gxx(T,R))
        rhs_xu = K_xu + jnp.einsum("ia,ajk->ijk",
                                   C, jnp.einsum("iab,aj,bk->ijk", G_xx, T, R))
        G_xu = -jnp.linalg.solve(A_l, rhs_xu.reshape(n, -1)).reshape(n, n, k)

        rhs_uu = K_uu + jnp.einsum("ia,ajk->ijk",
                                   C, jnp.einsum("iab,aj,bk->ijk", G_xx, R, R))
        G_uu = -jnp.linalg.solve(A_l, rhs_uu.reshape(n, -1)).reshape(n, k, k)
        G_uu = 0.5 * (G_uu + jnp.swapaxes(G_uu, 1, 2))

        # uncertainty correction: (B + C + C T) g_ss =
        #   -( C (G_uu : Q) + f_{y+ y+} : (R Q R^T) )
        Q_ = jnp.asarray(Q, dtype)
        guuQ = jnp.einsum("iab,ab->i", G_uu, Q_)
        H_pp = H[:, 2 * n:3 * n, 2 * n:3 * n]
        fvvRQR = jnp.einsum("ipq,pq->i", H_pp, R @ Q_ @ R.T)
        g_ss = -jnp.linalg.solve(B + C + C @ T, C @ guuQ + fvvRQR)

        success = sylv_ok & jnp.all(jnp.isfinite(G_xu)) \
            & jnp.all(jnp.isfinite(G_uu)) & jnp.all(jnp.isfinite(g_ss))
        return SecondOrderResult(G_xx, G_xu, G_uu, g_ss, success)

    return solve2


def _second_order_correction(res: SecondOrderResult, y1, eps, with_gss=True):
    quad = 0.5 * jnp.einsum("ijk,j,k->i", res.G_xx, y1, y1) \
        + jnp.einsum("ijk,j,k->i", res.G_xu, y1, eps) \
        + 0.5 * jnp.einsum("ijk,j,k->i", res.G_uu, eps, eps)
    if with_gss:
        quad = quad + 0.5 * res.g_ss
    return quad


def simulate_pruned(T, R, res: SecondOrderResult, shocks,
                    y1_0=None, y2_0=None, with_gss: bool = True):
    """Pruned second-order simulation (Kim-Kim-Schaumburg).

    ``shocks``: (periods, k) array of shock realizations.  Returns
    (periods, n) hat-coordinate paths  yhat = y1 + y2.
    """
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    n = T.shape[0]
    shocks = jnp.asarray(shocks, T.dtype)
    y1_0 = jnp.zeros((n,), T.dtype) if y1_0 is None else jnp.asarray(y1_0)
    y2_0 = jnp.zeros((n,), T.dtype) if y2_0 is None else jnp.asarray(y2_0)

    def step(carry, eps):
        y1, y2 = carry
        y1_next = T @ y1 + R @ eps
        y2_next = T @ y2 + _second_order_correction(res, y1, eps, with_gss)
        return (y1_next, y2_next), y1_next + y2_next

    _, path = jax.lax.scan(step, (y1_0, y2_0), shocks)
    return path


def second_order_mean(T, R, res: SecondOrderResult, Q):
    """Exact unconditional mean of the pruned second-order system.

    With y1 stationary (mean 0, covariance Sigma1 solving the first-order
    Lyapunov equation) and E[eps eps'] = Q, taking expectations of the
    pruned recursion gives

        E[y2] = (I - T)^{-1} ( 1/2 G_xx : Sigma1 + 1/2 G_uu : Q + 1/2 g_ss )

    (the G_xu cross term vanishes: y1_{t-1} is independent of eps_t).  This
    is the stochastic-steady-state shift — zero at first order.  Validated
    against long pruned simulations in tests/models/test_second_order.py.
    """
    from ..ops.lyapunov import solve_discrete_lyapunov

    T = jnp.asarray(T)
    R = jnp.asarray(R)
    Q = jnp.asarray(Q, T.dtype)
    Sigma1 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    drive = 0.5 * jnp.einsum("iab,ab->i", res.G_xx, Sigma1) \
        + 0.5 * jnp.einsum("iab,ab->i", res.G_uu, Q) \
        + 0.5 * res.g_ss
    eye = jnp.eye(T.shape[0], dtype=T.dtype)
    return jnp.linalg.solve(eye - T, drive)


def irf_second_order(T, R, res: SecondOrderResult, shock_vec,
                     periods: int = 40):
    """Deterministic second-order IRF: response to one impulse at t=0 from
    the stochastic steady state proxy (g_ss held constant, so it cancels in
    the difference) — i.e. simulate with and without the impulse and
    difference the paths."""
    k = R.shape[1]
    shocks = jnp.zeros((periods, k), jnp.asarray(T).dtype)
    shocks_hit = shocks.at[0].set(jnp.asarray(shock_vec))
    base = simulate_pruned(T, R, res, shocks, with_gss=False)
    hit = simulate_pruned(T, R, res, shocks_hit, with_gss=False)
    return hit - base


def generalized_irf(T, R, res: SecondOrderResult, shock_vec, Q,
                    periods: int = 40, n_draws: int = 256,
                    key=None, x0=None):
    """Generalized IRF (Koop-Pesaran-Potter 1996) for the pruned system.

    In a nonlinear model the impulse response depends on the state and on
    future shocks; the GIRF is  E[y | eps_0 = e + shock, history] −
    E[y | eps_0 = e, history],  estimated by Monte-Carlo over future shock
    paths (antithetic pairs share the same draws, so the difference is
    exact in the common terms).  ``x0`` optionally sets the initial
    first-order state (the GIRF is state-dependent at second order).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    n = T.shape[0]
    k = R.shape[1]
    chol = jnp.linalg.cholesky(jnp.asarray(Q, T.dtype))
    x0 = jnp.zeros((n,), T.dtype) if x0 is None else jnp.asarray(x0)

    eps = jax.random.normal(key, (n_draws, periods, k), T.dtype) @ chol.T
    eps_hit = eps.at[:, 0, :].add(jnp.asarray(shock_vec, T.dtype))

    def one(e):
        return simulate_pruned(T, R, res, e, y1_0=x0, with_gss=False)

    base = jax.vmap(one)(eps)
    hit = jax.vmap(one)(eps_hit)
    return jnp.mean(hit - base, axis=0)
