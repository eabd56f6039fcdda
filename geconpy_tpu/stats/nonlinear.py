"""Likelihood-based estimation of second-order (pruned) solutions.

The reference (gEconpy) estimates first-order solutions only — its Kalman
likelihood (``gEconpy/model/statespace.py:1139``) is linear.  This module
closes the loop on the beyond-parity second-order capability
(``models/second_order.py``): the pruned Kim-Kim-Schaumburg state space is
filtered with either

- the **unscented Kalman filter** (``ops/ukf.py``) — differentiable, so the
  same NUTS machinery used at first order samples second-order posteriors; or
- the **bootstrap particle filter** (``ops/particle_filter.py``) — an
  unbiased marginal-likelihood estimator for PMMH and for checking the UKF's
  Gaussian approximation.

Filter state (all per-draw matrices from the first/second-order solvers):

    z = [y1 (n), y2 (n), w_1 ... w_L (n each)]

    y1' = T y1 + R eps                              (first-order)
    y2' = T y2 + 1/2 G_xx(y1,y1) + G_xu(y1,eps)
               + 1/2 G_uu(eps,eps) + 1/2 g_ss       (pruned second-order)
    w_1' = y1 + y2,  w_{j+1}' = w_j                 (lag chain for
                                                     observation equations)

Observables load on [y1+y2, w_1, ..., w_L] through the same design matrix
``DSGEStateSpace._build_design`` builds for the linear filter, so growth
observables / temporal aggregation work unchanged at second order.

Initialization is the pruned system's stationary law: y1 ~ N(0, Sigma1)
(exact), y2 mean mu2 = (I-T)^{-1}(1/2 G_xx:Sigma1 + 1/2 G_uu:Q + 1/2 g_ss)
(exact — ``models/second_order.py::second_order_mean``) with covariance from
the quadratic-drive Lyapunov equation under a white-noise approximation of
the quadratic term (exact variance of the drive, Isserlis' theorem; serial
correlation of the drive is ignored at t=0 only).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.second_order import make_second_order_solver
from ..ops.lyapunov import solve_discrete_lyapunov
from ..ops.particle_filter import particle_filter_loglik
from ..ops.precision import highest_precision
from ..ops.ukf import ukf_loglik

__all__ = ["build_second_order_solution_fn", "build_logpost_second_order",
           "build_pf_loglik_second_order", "filter_data_second_order",
           "quadratic_drive_covariance"]


def quadratic_drive_covariance(G_xx, G_xu, G_uu, Sigma1, Q):
    """Exact covariance of the pruned quadratic drive

        q = 1/2 G_xx (y1 (x) y1) + G_xu (y1 (x) eps) + 1/2 G_uu (eps (x) eps)

    for y1 ~ N(0, Sigma1), eps ~ N(0, Q) independent.  By Isserlis' theorem
    (all cross terms are odd moments and vanish):

        Cov_A[i,j] = 1/2 tr(A_i Sigma1 A_j Sigma1)   (A_i = G_xx[i], sym)
        Cov_B[i,j] = sum_{abcd} Gxu[i,a,c] Gxu[j,b,d] Sigma1[a,b] Q[c,d]
        Cov_C[i,j] = 1/2 tr(C_i Q C_j Q)             (C_i = G_uu[i], sym)
    """
    AS = jnp.einsum("iab,bc->iac", G_xx, Sigma1)
    cov_A = 0.5 * jnp.einsum("iab,jba->ij", AS, AS)
    cov_B = jnp.einsum("iac,jbd,ab,cd->ij", G_xu, G_xu, Sigma1, Q)
    CQ = jnp.einsum("iab,bc->iac", G_uu, Q)
    cov_C = 0.5 * jnp.einsum("iab,jba->ij", CQ, CQ)
    return cov_A + cov_B + cov_C


def build_second_order_solution_fn(ss) -> Callable:
    """``u (unconstrained) -> dict`` with the per-draw pruned second-order
    state space: everything the first-order solution dict has, plus
    G_xx/G_xu/G_uu/g_ss, the filter-state init (x0, P0), and closures
    ``transition(z, eps)`` / ``observe(z)`` for the nonlinear filters.

    ``ss`` is a configured :class:`DSGEStateSpace`.
    """
    model = ss.model
    mf = model.functions
    n = mf.n_variables
    L = ss._obs_max_lag
    loglin = (model.default_loglin if ss.loglin_variables == "auto"
              else ss.loglin_variables)
    solve2 = make_second_order_solver(mf, loglin)
    # full_state: the quadratic correction involves every model variable, so
    # the filter-core reduction of the linear path does not apply
    pre_policy, policy, post_policy = ss._solution_pieces(full_state=True)

    @highest_precision
    def solve_draw(u: jnp.ndarray) -> dict:
        pre = pre_policy(u)
        T, R, solver_ok = policy(pre)
        sol = post_policy(pre, T, R, solver_ok)
        dtype = T.dtype

        so = solve2(sol["x_ss"], sol["theta_full"], T, R, sol["Q"])
        G_xx, G_xu, G_uu, g_ss = so.G_xx, so.G_xu, so.G_uu, so.g_ss

        # stationary init of the pruned system (guarded against unstable T)
        T_safe = jnp.where(sol["stable"], T, jnp.zeros_like(T))
        RQR = R @ sol["Q"] @ R.T
        Sigma1 = solve_discrete_lyapunov(T_safe, RQR)
        drive = 0.5 * jnp.einsum("iab,ab->i", G_xx, Sigma1) \
            + 0.5 * jnp.einsum("iab,ab->i", G_uu, sol["Q"]) + 0.5 * g_ss
        eye = jnp.eye(n, dtype=dtype)
        mu2 = jnp.linalg.solve(eye - T_safe, drive)
        cov_q = quadratic_drive_covariance(G_xx, G_xu, G_uu, Sigma1,
                                           sol["Q"])
        Sigma2 = solve_discrete_lyapunov(T_safe, cov_q)

        nz = (2 + L) * n
        x0 = jnp.zeros((nz,), dtype).at[n:2 * n].set(mu2)
        P0 = jnp.zeros((nz, nz), dtype)
        P0 = P0.at[:n, :n].set(Sigma1)
        P0 = P0.at[n:2 * n, n:2 * n].set(Sigma2)
        St = Sigma1 + Sigma2
        for j in range(L):
            lo = (2 + j) * n
            x0 = x0.at[lo:lo + n].set(mu2)
            P0 = P0.at[lo:lo + n, lo:lo + n].set(St)

        def transition(z, eps):
            y1, y2 = z[:n], z[n:2 * n]
            y1n = T @ y1 + R @ eps
            quad = 0.5 * jnp.einsum("ijk,j,k->i", G_xx, y1, y1) \
                + jnp.einsum("ijk,j,k->i", G_xu, y1, eps) \
                + 0.5 * jnp.einsum("ijk,j,k->i", G_uu, eps, eps) \
                + 0.5 * g_ss
            y2n = T @ y2 + quad
            pieces = [y1n, y2n]
            if L:
                pieces.append(y1 + y2)              # w_1' = current total
                pieces.append(z[2 * n:2 * n + (L - 1) * n])  # shift chain
            return jnp.concatenate(pieces)

        Z, d = sol["Z"], sol["d"]

        def observe(z):
            total = z[:n] + z[n:2 * n]
            stack = jnp.concatenate([total, z[2 * n:]])
            return Z @ stack + d

        # conditionally-linear split for the marginalized UKF
        # (ops/ukf.py::cl_ukf_loglik): z' = A z + b(y1, eps) with A linear
        # and b touching only the leading y1 block and the shock
        A_lin = jnp.zeros((nz, nz), dtype)
        A_lin = A_lin.at[:n, :n].set(T)
        A_lin = A_lin.at[n:2 * n, n:2 * n].set(T)
        if L:
            A_lin = A_lin.at[2 * n:3 * n, :n].set(eye)       # w1' = y1 + y2
            A_lin = A_lin.at[2 * n:3 * n, n:2 * n].set(eye)
            for j in range(L - 1):
                A_lin = A_lin.at[(3 + j) * n:(4 + j) * n,
                                 (2 + j) * n:(3 + j) * n].set(eye)

        def nonlinear(y1, eps):
            quad = 0.5 * jnp.einsum("ijk,j,k->i", G_xx, y1, y1) \
                + jnp.einsum("ijk,j,k->i", G_xu, y1, eps) \
                + 0.5 * jnp.einsum("ijk,j,k->i", G_uu, eps, eps) \
                + 0.5 * g_ss
            out = jnp.zeros((nz,), dtype)
            out = out.at[:n].set(R @ eps)
            out = out.at[n:2 * n].set(quad)
            return out

        # observation design over the flat pruned state (y1, y2, lags):
        # y1 and y2 both load through the "current" columns of Z
        Z_cl = jnp.concatenate([Z[:, :n], Z[:, :n], Z[:, n:]], axis=1)

        sol.update(G_xx=G_xx, G_xu=G_xu, G_uu=G_uu, g_ss=g_ss,
                   so_success=so.success, x0=x0, P0=P0, mu2=mu2,
                   Sigma1=Sigma1, transition=transition, observe=observe,
                   A_cl=A_lin, nonlinear=nonlinear, Z_cl=Z_cl)
        return sol

    return solve_draw


def build_logpost_second_order(ss, data, ukf_alpha: float = 1.0,
                               ukf_beta: float = 2.0, ukf_kappa: float = 0.0,
                               jitter: float = 0.0,
                               method: str = "marginalized",
                               remat: bool = True) -> Callable:
    """Differentiable second-order log posterior via the unscented filter.

    Drop-in NUTS target with the same gating semantics as the first-order
    ``build_logpost``: any failure (steady state, policy solve, instability,
    Sylvester divergence, filter blow-up) yields -inf, never an exception.

    ``remat=True`` (default) recomputes filter steps in the backward pass
    instead of storing per-step intermediates — batched NUTS gradients at
    batch 512 x 200 periods otherwise exceed a 16GB chip's HBM (measured).

    ``method="marginalized"`` (default) uses the Rao-Blackwellized filter
    (``ops/ukf.py::cl_ukf_loglik``): the pruned system is conditionally
    linear given (y1, eps) and its observation is linear, so sigma points
    span only (n + q) dimensions and the update is an exact Kalman step —
    about half the per-step work of ``method="full"`` (the generic
    augmented-state UKF).  Both are exact on linear models and second-order
    accurate otherwise; the marginalized form additionally propagates the
    conditional remainder exactly.
    """
    y = jnp.asarray(data)
    if y.ndim != 2 or y.shape[1] != len(ss.observed_states):
        raise ValueError(
            f"data must be (periods, {len(ss.observed_states)}), got {y.shape}")
    if method not in ("marginalized", "full"):
        raise ValueError(f"method must be 'marginalized' or 'full', "
                         f"got {method!r}")
    solve_draw = build_second_order_solution_fn(ss)
    n_nl = ss.model.functions.n_variables

    @highest_precision
    def logpost(u: jnp.ndarray) -> jax.Array:
        dtype = u.dtype
        sol = solve_draw(u)
        if method == "marginalized":
            from ..ops.ukf import cl_ukf_loglik

            res = cl_ukf_loglik(y, sol["A_cl"], sol["nonlinear"],
                                sol["Z_cl"], sol["H"], sol["d"], sol["Q"],
                                sol["x0"], sol["P0"], n_nl,
                                alpha=ukf_alpha, beta=ukf_beta,
                                kappa=ukf_kappa, jitter=jitter, remat=remat)
        else:
            res = ukf_loglik(y, sol["transition"], sol["observe"], sol["Q"],
                             sol["H"], sol["x0"], sol["P0"], alpha=ukf_alpha,
                             beta=ukf_beta, kappa=ukf_kappa, jitter=jitter,
                             remat=remat)
        ok = sol["ss_success"] & sol["solver_success"] & sol["stable"] \
            & sol["so_success"] & res.success \
            & jnp.isfinite(res.loglik) & jnp.isfinite(sol["logprior"])
        return jnp.where(ok, res.loglik + sol["logprior"],
                         jnp.asarray(-jnp.inf, dtype))

    return logpost


def filter_data_second_order(ss, data, params: dict | None = None,
                             smoother: bool = False):
    """Unscented-filter (or -smooth) the data through the pruned
    second-order state space at one parameter point.

    Role parity with ``DSGEStateSpace.filter_data`` at first order: returns
    a pandas DataFrame of TOTAL hat-coordinate state paths (y1 + y2) labeled
    by variable, with ``df.attrs["loglik"]`` the UKF log-likelihood and
    ``df.attrs["y1"] / df.attrs["y2"]`` the pruned components.
    """
    import numpy as np
    import pandas as pd

    from ..ops.ukf import ukf_smoother

    if params is None:
        u = ss.initial_position()
    else:
        vals = []
        for p_ in ss.estimated:
            if p_.name in params:
                vals.append(float(params[p_.name]))
            else:
                v = p_.initial if p_.initial is not None else p_.prior.mean()
                vals.append(float(v))
        u = ss.unconstrain(np.asarray(vals))
    sol = build_second_order_solution_fn(ss)(u)
    y = jnp.asarray(data)
    res = ukf_smoother(y, sol["transition"], sol["observe"], sol["Q"],
                       sol["H"], sol["x0"], sol["P0"])
    n = ss.model.functions.n_variables
    means = res.smoothed_mean if smoother else res.filtered_mean
    y1 = np.asarray(means[:, :n])
    y2 = np.asarray(means[:, n:2 * n])
    df = pd.DataFrame(y1 + y2, columns=ss.model.functions.variable_names)
    df.attrs["loglik"] = float(res.loglik)
    df.attrs["y1"] = y1
    df.attrs["y2"] = y2
    return df


def build_pf_loglik_second_order(ss, data, n_particles: int = 4096,
                                 ess_threshold: float = 0.5) -> Callable:
    """``(u, key) -> (loglik, success)`` — unbiased particle-filter marginal
    likelihood of the pruned second-order system (for PMMH / checking the
    UKF Gaussian approximation; NOT differentiable through resampling)."""
    y = jnp.asarray(data)
    solve_draw = build_second_order_solution_fn(ss)

    @highest_precision
    def loglik(u: jnp.ndarray, key) -> tuple[jax.Array, jax.Array]:
        sol = solve_draw(u)
        k_init, k_run = jax.random.split(key)
        nz = sol["x0"].shape[0]
        # init cloud from N(x0, P0) via the (PSD-guarded) Cholesky factor
        P0 = sol["P0"] + jnp.eye(nz, dtype=sol["P0"].dtype) * 1e-12
        chol = jnp.linalg.cholesky(P0)
        init = sol["x0"][None, :] \
            + jax.random.normal(k_init, (n_particles, nz),
                                sol["x0"].dtype) @ chol.T
        res = particle_filter_loglik(k_run, y, init, sol["transition"],
                                     sol["observe"], sol["Q"], sol["H"],
                                     ess_threshold=ess_threshold)
        ok = sol["ss_success"] & sol["solver_success"] & sol["stable"] \
            & sol["so_success"] & res.success
        return res.loglik, ok

    return loglik
