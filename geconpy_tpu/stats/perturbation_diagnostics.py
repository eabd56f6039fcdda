"""Perturbation-solution diagnostics and prior solvability sweeps.

Role parity with ``gEconpy/model/statistics/perturbation_diagnostics.py``
(summarize_perturbation_solution:164, check_bk_condition:193,
eigenvalue_sensitivity:244, solvability_check:362,
prior_solvability_check:526).  The reference parallelizes sweeps with a
``multiprocessing.Pool`` + cloudpickle; here each draw's whole pipeline
(steady state -> linearize -> policy -> norms) is one vmapped device
function, optionally sharded over a mesh — thousands of draws per dispatch,
failure-stage attribution via flags.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..dists import Distribution, resolve_priors
from ..models.model import Model
from ..models.perturbation import spectral_radius
from ..ops.cycle_reduction import cycle_reduction, selection_matrix
from ..ops.tolerances import success_tol
from .sampling import sample_from_priors, sample_from_priors_qmc, \
    sample_uniform_from_priors

__all__ = ["check_bk_condition", "solvability_check", "prior_solvability_check",
           "bk_condition_sweep", "make_bk_count_fn",
           "summarize_perturbation_solution", "eigenvalue_sensitivity",
           "spectral_radius_sensitivity"]

_STAGES = ["steady_state", "linearization", "policy_solve", "stability",
           "residual_norms"]


def _make_per_draw(model: Model, loglin_variables=True,
                   norm_tol: float = 1e-6):
    linearize = model.linearizer(loglin_variables)
    ss_solver = model.ss_solver

    def per_draw(theta):
        sol = ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        lin_ok = jnp.all(jnp.isfinite(lin.A)) & jnp.all(jnp.isfinite(lin.B)) \
            & jnp.all(jnp.isfinite(lin.C)) & jnp.all(jnp.isfinite(lin.D))
        cr = cycle_reduction(lin.A, lin.B, lin.C)
        R = selection_matrix(lin.B, lin.C, cr.T, lin.D)
        rho = spectral_radius(cr.T)
        stable = jnp.isfinite(rho) & (rho < 1.0 + 1e-6)
        det_norm = jnp.max(jnp.abs(lin.A + lin.B @ cr.T + lin.C @ cr.T @ cr.T))
        stoch_norm = jnp.max(jnp.abs((lin.B + lin.C @ cr.T) @ R + lin.D))
        tol = success_tol(theta.dtype, norm_tol)
        norms_ok = jnp.isfinite(det_norm) & (det_norm < tol) \
            & jnp.isfinite(stoch_norm) & (stoch_norm < tol)
        return {
            "steady_state": sol.success,
            "linearization": lin_ok,
            "policy_solve": cr.success,
            "stability": stable,
            "residual_norms": norms_ok,
            "spectral_radius": rho,
            "deterministic_norm": det_norm,
            "stochastic_norm": stoch_norm,
        }

    return per_draw


def solvability_check(model: Model, param_draws: dict[str, np.ndarray],
                      loglin_variables=True, mesh=None) -> pd.DataFrame:
    """Run the solve pipeline for every draw; attribute failures to stages.

    ``param_draws`` maps parameter names to 1-D arrays of equal length;
    unspecified parameters stay at calibration.  Returns a DataFrame with one
    row per draw: the draw values, per-stage success flags, and norms.
    """
    names = list(param_draws)
    n_draws = len(next(iter(param_draws.values())))
    free_names = [p.name for p in model.functions.free_params]
    unknown = set(names) - set(free_names)
    if unknown:
        raise ValueError(f"unknown parameters in draws: {sorted(unknown)}")

    theta0 = np.asarray(model.default_theta())
    thetas = np.tile(theta0, (n_draws, 1))
    for name, values in param_draws.items():
        thetas[:, free_names.index(name)] = np.asarray(values)
    thetas = jnp.asarray(thetas)

    per_draw = _make_per_draw(model, loglin_variables)
    if mesh is not None:
        from ..parallel.mesh import sharded_prior_sweep

        out = sharded_prior_sweep(per_draw, thetas, mesh)
    else:
        out = jax.jit(jax.vmap(per_draw))(thetas)

    df = pd.DataFrame({name: np.asarray(v) for name, v in param_draws.items()})
    for stage in _STAGES:
        df[stage] = np.asarray(out[stage])
    df["success"] = df[_STAGES].all(axis=1)
    # failure-stage attribution: first stage that failed
    stage_arr = df[_STAGES].to_numpy()
    first_fail = np.where(df["success"], -1, np.argmin(stage_arr, axis=1))
    df["failure_stage"] = [
        "none" if i < 0 else _STAGES[i] for i in first_fail
    ]
    df["spectral_radius"] = np.asarray(out["spectral_radius"])
    df["deterministic_norm"] = np.asarray(out["deterministic_norm"])
    df["stochastic_norm"] = np.asarray(out["stochastic_norm"])
    return df


def prior_solvability_check(model: Model, n_samples: int = 1000,
                            how: str = "mc", seed: int = 0, mesh=None,
                            param_subset: list[str] | None = None
                            ) -> pd.DataFrame:
    """Sweep the GCN priors and report where the model is solvable.

    ``how``: 'mc' (prior draws), 'qmc' (Sobol through the prior inverse CDF),
    'uniform'/'lhs'/'sobol'/'halton' (space-filling over prior HDI boxes).
    """
    param_priors, _ = resolve_priors(model.primitives.priors,
                                     model.primitives.shock_priors)
    free_names = {p.name for p in model.functions.free_params}
    priors = {k: v for k, v in param_priors.items() if k in free_names}
    if param_subset:
        priors = {k: v for k, v in priors.items() if k in param_subset}
    if not priors:
        raise ValueError("model has no priors on free parameters to sweep")

    if how == "mc":
        draws = sample_from_priors(priors, n_samples, seed)
    elif how == "qmc":
        draws = sample_from_priors_qmc(priors, n_samples, seed=seed)
    else:
        draws = sample_uniform_from_priors(priors, n_samples, method=how,
                                           seed=seed)
    return solvability_check(model, draws, mesh=mesh)


def make_bk_count_fn(model: Model, loglin_variables=True,
                     radius: float = 1.0 + 1e-6, n_iter: int = 30):
    """Jittable/vmappable ``theta -> BK count dict`` — no host callbacks.

    Per draw: steady state -> linearize -> Sims-augmented pencil -> repeated
    disk split (:func:`geconpy_tpu.ops.qz_disk.count_eigs_inside`) counting
    |lambda| > ``radius`` roots (infinite ones included) against the number
    of forward-looking variables.  This is the device-side replacement for
    the host-QZ table in sweeps (reference diagnostic:
    ``gEconpy/model/perturbation.py:412,448``; the per-model human-readable
    table stays on :meth:`Model.check_bk_condition`).
    """
    from ..ops.qz_disk import count_eigs_inside

    linearize = model.linearizer(loglin_variables)
    ss_solver = model.ss_solver     # build eagerly: lazy construction inside
    #                                 a jit trace would leak traced constants
    lead_idx = model.lead_var_idx
    n_forward = len(lead_idx)

    def per_draw(theta):
        sol = ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        g0, g1 = _bk_pencil(lin.A, lin.B, lin.C, lead_idx)
        n_inside, count_ok = count_eigs_inside(g1, g0, radius=radius,
                                               n_iter=n_iter)
        m = g0.shape[0]
        n_unstable = m - n_inside
        lin_ok = jnp.all(jnp.isfinite(g0)) & jnp.all(jnp.isfinite(g1))
        ok = sol.success & lin_ok & count_ok
        return {
            "n_unstable": n_unstable,
            "n_forward": jnp.asarray(n_forward, n_unstable.dtype),
            "bk_satisfied": ok & (n_unstable == n_forward),
            "ok": ok,
        }

    return per_draw


def bk_condition_sweep(model: Model, param_draws: dict[str, np.ndarray],
                       loglin_variables=True, mesh=None) -> pd.DataFrame:
    """Per-draw Blanchard-Kahn counts over a parameter sweep, vmapped on
    device (and optionally sharded over a mesh) — no per-draw host trips.

    ``param_draws`` maps parameter names to equal-length 1-D arrays
    (unspecified parameters stay at calibration).  Returns one row per draw
    with ``n_unstable``, ``n_forward``, ``bk_satisfied`` and an ``ok`` flag
    (False when the steady state failed or a root sits on the unit circle,
    where the count is ill-defined).
    """
    names = list(param_draws)
    n_draws = len(next(iter(param_draws.values())))
    free_names = [p.name for p in model.functions.free_params]
    unknown = set(names) - set(free_names)
    if unknown:
        raise ValueError(f"unknown parameters in draws: {sorted(unknown)}")

    theta0 = np.asarray(model.default_theta())
    thetas = np.tile(theta0, (n_draws, 1))
    for name, values in param_draws.items():
        thetas[:, free_names.index(name)] = np.asarray(values)
    thetas = jnp.asarray(thetas)

    per_draw = make_bk_count_fn(model, loglin_variables)
    if mesh is not None:
        from ..parallel.mesh import sharded_prior_sweep

        out = sharded_prior_sweep(per_draw, thetas, mesh)
    else:
        out = jax.jit(jax.vmap(per_draw))(thetas)

    df = pd.DataFrame({name: np.asarray(v) for name, v in param_draws.items()})
    for k in ("n_unstable", "n_forward", "bk_satisfied", "ok"):
        df[k] = np.asarray(out[k])
    return df


def summarize_perturbation_solution(solution) -> pd.DataFrame:
    """gEcon-style P/Q/R/S table from a PolicySolution."""
    from ..models.perturbation import gecon_matrices

    P, Q, R_out, S, state_idx, jump_idx = gecon_matrices(
        solution.T.to_numpy(), solution.R.to_numpy(), solution.T.columns)
    names = list(solution.T.columns)
    states = [names[i] for i in state_idx]
    jumps = [names[i] for i in jump_idx]
    shock_names = list(solution.R.columns)
    blocks = {
        "P": pd.DataFrame(P, index=states, columns=states),
        "Q": pd.DataFrame(Q, index=states, columns=shock_names),
        "R": pd.DataFrame(R_out, index=jumps, columns=states),
        "S": pd.DataFrame(S, index=jumps, columns=shock_names),
    }
    out = pd.concat(blocks, axis=0)
    out.attrs["states"] = states
    out.attrs["jumps"] = jumps
    return out


def spectral_radius_sensitivity(model: Model, **updates) -> pd.DataFrame:
    """d(spectral radius of T)/d(parameter) via the solver adjoints — a
    cheap whole-system stability gradient (Gelfand matrix-power proxy) that
    stays fully on device."""
    linearize = model.linearizer(True)

    def rho_of_theta(theta):
        sol = model.ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        cr = cycle_reduction(lin.A, lin.B, lin.C)
        # differentiable spectral-radius proxy (Gelfand via matrix powers)
        M = cr.T
        for _ in range(5):
            M = M @ M
        return jnp.linalg.norm(M, ord="fro") ** (1.0 / 32.0)

    theta = model.default_theta(**updates)
    grad = jax.jit(jax.grad(rho_of_theta))(theta)
    names = [p.name for p in model.functions.free_params]
    return pd.DataFrame({"d_rho_d_param": np.asarray(grad)}, index=names)


def _bk_pencil(A, B, C, lead_idx):
    """Sims-augmented pencil (g1, g0): the BK roots are the generalized
    eigenvalues ``g1 x = lambda g0 x`` (infinite roots from singular g0
    directions).  Traced/differentiable; mirrors the reference's symbolic
    construction (``gEconpy/model/perturbation.py:448``)."""
    n = A.shape[0]
    k = len(lead_idx)
    m = n + k
    dtype = A.dtype
    lead_j = jnp.asarray(np.asarray(lead_idx), dtype=jnp.int32)

    g0 = jnp.zeros((m, m), dtype)
    g0 = g0.at[:n, :n].set(-B)
    g0 = g0.at[:n, n:].set(-C[:, lead_j])
    g0 = g0.at[jnp.arange(n, m), lead_j].set(1.0)

    g1 = jnp.zeros((m, m), dtype)
    g1 = g1.at[:n, :n].set(A)
    g1 = g1.at[jnp.arange(n, m), jnp.arange(n, m)].set(1.0)
    return g0, g1


def _bk_companion(A, B, C, lead_idx, eps: float = 1e-7):
    """Sims-augmented transition matrix M = (−Γ0 + εI)⁻¹ Γ1 whose
    eigenvalues are the BK generalized eigenvalues (infinite roots become
    O(1/ε), still counted as unstable).  Traced/differentiable.

    ε trades off the perturbation of finite roots (O(ε)) against the eig
    accuracy of the finite roots, which degrades as O(macheps · 1/ε) through
    the O(1/ε) regularized-infinite roots; 1e-7 keeps both below ~1e-5 in
    float64."""
    g0, g1 = _bk_pencil(A, B, C, lead_idx)
    G0 = g0 + eps * jnp.eye(g0.shape[0], dtype=A.dtype)
    return jnp.linalg.solve(G0, g1)


def eigenvalue_sensitivity(model: Model, **updates) -> pd.DataFrame:
    """Per-eigenvalue sensitivity table: d(Re λ)/dθ, d(Im λ)/dθ and
    d|λ|/dθ for every eigenvalue of the Sims-augmented BK pencil.

    Role parity with the reference's autodiff eigenvalue sensitivity
    (``gEconpy/model/statistics/perturbation_diagnostics.py:244``): exact
    per-eigenvalue gradients through the differentiable eigenvalue op
    (:func:`geconpy_tpu.ops.eig.eig_vals` — host-callback factorization
    with an analytic VJP).  Returns a DataFrame indexed by
    (eigenvalue index, part ∈ {real, imag, modulus}) with one column per
    free parameter, plus the eigenvalues themselves in ``.attrs``.
    """
    from ..ops.eig import eig_vals

    linearize = model.linearizer(True)
    lead_idx = model.lead_var_idx

    def lam_parts(theta):
        sol = model.ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        M = _bk_companion(lin.A, lin.B, lin.C, lead_idx)
        re, im = eig_vals(M)
        return jnp.stack([re, im])

    theta = model.default_theta(**updates)
    parts = np.asarray(lam_parts(theta))
    jac = np.asarray(jax.jacrev(lam_parts)(theta))  # (2, m, P)
    re, im = parts[0], parts[1]
    mod = np.hypot(re, im)
    # chain rule for the modulus, guarding |λ| = 0
    denom = np.where(mod > 0, mod, 1.0)
    dmod = (re[:, None] * jac[0] + im[:, None] * jac[1]) / denom[:, None]

    names = [p.name for p in model.functions.free_params]
    m = len(re)
    index = pd.MultiIndex.from_product(
        [range(m), ["real", "imag", "modulus"]],
        names=["eigenvalue", "part"])
    table = np.concatenate([jac[0], jac[1], dmod], axis=1).reshape(m, 3, -1)
    df = pd.DataFrame(table.reshape(m * 3, -1), index=index, columns=names)
    df.attrs["eigenvalues"] = re + 1j * im
    df.attrs["modulus"] = mod
    return df


def check_bk_condition(model: Model, verbose: bool = True, **updates):
    """Standalone facade over :meth:`Model.check_bk_condition` (the reference
    exports a module-level ``check_bk_condition``,
    ``gEconpy/model/statistics/perturbation_diagnostics.py:193``)."""
    return model.check_bk_condition(verbose=verbose, **updates)
