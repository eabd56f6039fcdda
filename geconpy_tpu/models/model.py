"""User-facing Model object.

Role parity with ``gEconpy/model/model.py`` (Model:253, parameters:738,
steady_state:919, linearize_model:1489, solve_model:1731) and
``gEconpy/model/build.py`` (model_from_gcn:466).

The Model owns one :class:`ModelFunctions` bundle and exposes:

- host-friendly methods returning labeled results (SymbolDictionary /
  pandas), for interactive use;
- the underlying jitted pipeline pieces (``ss_solver``, ``linearizer``,
  policy solvers) for batched/vmapped estimation, where thousands of
  parameter draws run through steady state -> linearization -> policy solve
  as one XLA program.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import cached_property
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..codegen.model_functions import ModelFunctions, build_model_functions
from ..ops.cycle_reduction import solve_policy_cycle_reduction
from ..ops.gensys_np import interpret_eu, solve_policy_gensys
from ..symbolic import SteadyStateResults, SymbolDictionary
from .perturbation import make_linearizer, solve_policy_backward, spectral_radius
from .primitives import ModelPrimitives, load_gcn, load_gcn_file
from .steady_state import make_steady_state_solver
from .timing import classify_variables_by_timing, structural_incidence

_log = logging.getLogger(__name__)

__all__ = ["Model", "PolicySolution", "model_from_gcn"]

VALID_SOLVERS = ("cycle_reduction", "gensys", "gensys_host", "backward")


@dataclass
class PolicySolution:
    """First-order solution  ŷ_t = T ŷ_{t-1} + R ε_t  with diagnostics."""

    T: pd.DataFrame
    R: pd.DataFrame
    success: bool
    solver: str
    deterministic_norm: float
    stochastic_norm: float
    spectral_radius: float
    eu: tuple[int, int] | None = None
    steady_state: SteadyStateResults | None = None
    loglin_scale: np.ndarray | None = None

    # ------------------------------------------------------- conveniences
    def impulse_responses(self, periods: int = 40, **kwargs):
        """Per-shock IRFs as an xarray (see analysis.simulate.impulse_response_function)."""
        from ..analysis.simulate import impulse_response_function

        return impulse_response_function(self, periods=periods, **kwargs)

    def simulate(self, periods: int = 40, n_simulations: int = 100, **kwargs):
        """Stochastic simulations from the linear solution (analysis.simulate.simulate)."""
        from ..analysis.simulate import simulate

        return simulate(self, periods=periods, n_simulations=n_simulations,
                        **kwargs)

    def stationary_covariance(self, **kwargs):
        """Stationary covariance of the solved model (Lyapunov fixed point)."""
        from ..stats.covariance import stationary_covariance_matrix

        return stationary_covariance_matrix(self, **kwargs)

    def autocorrelation(self, n_lags: int = 10, **kwargs):
        """Autocorrelation matrices Gamma_k for k = 0..n_lags."""
        from ..stats.covariance import autocovariance_matrix

        return autocovariance_matrix(self, n_lags=n_lags, **kwargs)

    def summary(self):
        """P/Q/R/S policy tables + eigenvalue/BK report (perturbation_diagnostics)."""
        from ..stats.perturbation_diagnostics import (
            summarize_perturbation_solution,
        )

        return summarize_perturbation_solution(self)

    def __repr__(self):
        status = "ok" if self.success else "FAILED"
        msg = (f"PolicySolution({self.solver}, {status}, "
               f"det_norm={self.deterministic_norm:.2e}, "
               f"stoch_norm={self.stochastic_norm:.2e}, "
               f"rho={self.spectral_radius:.4f}")
        if self.eu is not None:
            msg += f", eu={self.eu}"
        return msg + ")"


class Model:
    """A compiled DSGE model."""

    def __init__(self, primitives: ModelPrimitives):
        self.primitives = primitives
        self._solvers: dict = {}

    # ------------------------------------------------------------ lazy builds
    @cached_property
    def functions(self) -> ModelFunctions:
        return build_model_functions(self.primitives)

    @cached_property
    def ss_solver(self):
        return make_steady_state_solver(self.functions)

    @property
    def default_loglin(self) -> bool:
        """Linear models (GCN ``options { linear = TRUE; }``) are already in
        deviations; log-linearization scaling is skipped for them."""
        return not self.primitives.is_linear

    def linearizer(self, loglin_variables="auto"):
        """Cached jittable ``(x_ss, theta_full) -> Linearization`` for this model."""
        if loglin_variables == "auto":
            loglin_variables = self.default_loglin
        key = ("linearizer", loglin_variables if isinstance(loglin_variables, bool)
               else tuple(sorted(loglin_variables)))
        if key not in self._solvers:
            self._solvers[key] = make_linearizer(self.functions, loglin_variables)
        return self._solvers[key]

    # ------------------------------------------------------------- properties
    @property
    def variables(self) -> list[str]:
        """Variable names in model (declaration) order."""
        return self.functions.variable_names

    @property
    def shocks(self) -> list[str]:
        """Shock names in declaration order."""
        return self.functions.shock_names

    @property
    def param_names(self) -> list[str]:
        """Free (non-deterministic) parameter names, the order of ``default_theta``."""
        return [p.name for p in self.functions.free_params]

    @property
    def n_variables(self) -> int:
        """Number of model variables (static shape of the solved system)."""
        return self.functions.n_variables

    @property
    def n_shocks(self) -> int:
        """Number of exogenous shocks."""
        return self.functions.n_shocks

    @cached_property
    def static_reduction(self):
        """Structural static/dynamic split for the reduced policy solve."""
        from ..ops.static_reduction import plan_static_reduction

        return plan_static_reduction(self.primitives.equations,
                                     self.functions.variables)

    @cached_property
    def lead_var_idx(self):
        """Indices of variables appearing at t+1 (structural)."""
        import numpy as np

        inc = structural_incidence(self.primitives.equations,
                                   self.functions.variables)
        return np.flatnonzero(inc["lead"].any(axis=0))

    @cached_property
    def gensys_solver(self):
        """Jittable on-device gensys (disk-split) for this model's layout."""
        from ..ops.gensys_jax import make_gensys_solver

        return make_gensys_solver(self.n_variables, self.lead_var_idx,
                                  self.n_shocks)

    @cached_property
    def is_backward_looking(self) -> bool:
        """True when no equation references t+1 (structural fact)."""
        inc = structural_incidence(self.primitives.equations,
                                   self.functions.variables)
        return not inc["lead"].any()

    @cached_property
    def variable_timing(self) -> dict[str, list[str]]:
        classified = classify_variables_by_timing(
            self.primitives.equations, self.functions.variables)
        return {k: [v.base_name for v in vs] for k, vs in classified.items()}

    # ----------------------------------------------------------------- params
    def default_theta(self, **updates) -> jnp.ndarray:
        """Free-parameter vector from GCN calibration, with overrides."""
        values = {p.name: float(v) for p, v in self.primitives.param_dict.items()}
        unknown = set(updates) - set(values)
        if unknown:
            raise KeyError(f"unknown parameter(s): {sorted(unknown)}; "
                           f"free parameters are {sorted(values)}")
        values.update({k: float(v) for k, v in updates.items()})
        return jnp.array([values[p.name] for p in self.functions.free_params])

    def parameters(self, **updates) -> SymbolDictionary:
        """Full parameter dictionary (free + deterministic), with overrides."""
        theta = self.default_theta(**updates)
        full = np.asarray(self.functions.f_params(theta))
        syms = (list(self.functions.free_params)
                + list(self.functions.deterministic_params))
        return SymbolDictionary(dict(zip(syms, full.tolist())))

    # ----------------------------------------------------------- steady state
    def steady_state(self, verbose: bool = True,
                     fixed_values: dict[str, float] | None = None,
                     method: str = "hybrid",
                     **updates) -> SteadyStateResults:
        """Solve the steady state.  ``fixed_values`` pins chosen variables
        (role parity with gEconpy/model/model.py:1097): the remaining system
        is solved and the FULL residual validated, so an inconsistent pin
        fails loudly.  ``method`` selects the numeric root-finder
        ('hybrid' (default), 'newton', 'newton_nm', 'chord', 'lm', 'dogleg',
        'gauss_newton' — role parity with the reference's better_optimize /
        sparse_root method choices)."""
        theta = self.default_theta(**updates)
        if fixed_values:
            from .steady_state import make_fixed_value_solver

            names = sorted(fixed_values)
            key = ("fixed_ss", tuple(names))
            if key not in self._solvers:
                self._solvers[key] = make_fixed_value_solver(
                    self.functions, names)
            vals = jnp.asarray([float(fixed_values[k]) for k in names])
            sol = jax.jit(self._solvers[key])(theta, vals)
        elif method != "hybrid":
            key = ("ss_method", method)
            if key not in self._solvers:
                self._solvers[key] = make_steady_state_solver(
                    self.functions, method=method)
            sol = jax.jit(self._solvers[key])(theta)
        else:
            sol = jax.jit(self.ss_solver)(theta)
        success = bool(sol.success)
        if verbose:
            if success:
                _log.info("Steady state found (resid norm %.3e, %d iterations)",
                          float(sol.resid_norm), int(sol.n_iter))
            else:
                _log.warning("Steady state FAILED (resid norm %.3e)",
                             float(sol.resid_norm))
        values = np.asarray(sol.x_ss)
        result = SteadyStateResults(
            {v.to_ss(): float(values[i]) for i, v in enumerate(self.functions.variables)},
            success=success,
            resid_norm=float(sol.resid_norm),
        )
        if self.functions.calibrated_params:
            theta_full = np.asarray(sol.theta_full)
            offset = len(self.functions.free_params) + len(self.functions.deterministic_params)
            for i, p in enumerate(self.functions.calibrated_params):
                result[p] = float(theta_full[offset + i])
        return result

    # ---------------------------------------------------------- linearization
    def linearize_model(self, loglin_variables="auto",
                        steady_state: SteadyStateResults | None = None,
                        **updates) -> dict[str, pd.DataFrame]:
        """A/B/C/D of  A ŷ_{t-1} + B ŷ_t + C ŷ_{t+1} + D ε_t = 0 at the SS."""
        theta = self.default_theta(**updates)
        sol = jax.jit(self.ss_solver)(theta)
        lin = jax.jit(self.linearizer(loglin_variables))(sol.x_ss, sol.theta_full)
        names = self.variables
        out = {
            "A": pd.DataFrame(np.asarray(lin.A), columns=names),
            "B": pd.DataFrame(np.asarray(lin.B), columns=names),
            "C": pd.DataFrame(np.asarray(lin.C), columns=names),
            "D": pd.DataFrame(np.asarray(lin.D), columns=self.shocks),
        }
        return out

    # ------------------------------------------------------------------ solve
    def solve_model(
        self,
        solver: Literal["cycle_reduction", "gensys", "backward"] | None = None,
        loglin_variables="auto",
        tol: float = 1e-12,
        maxiter: int = 100,
        on_failure: Literal["error", "ignore"] = "error",
        verbose: bool = True,
        **updates,
    ) -> PolicySolution:
        """Steady state -> linearize -> first-order policy  T, R.

        ``solver=None`` auto-selects: backward direct for purely
        backward-looking models, otherwise cycle reduction with a gensys
        fallback (cycle reduction requires a nonsingular reduced B pencil;
        some well-posed models — e.g. TANK-style aggregation identities —
        only solve via the generalized-Schur split).
        """
        auto = solver is None
        if solver is None:
            solver = "backward" if self.is_backward_looking else "cycle_reduction"
        if solver not in VALID_SOLVERS:
            raise ValueError(f"solver must be one of {VALID_SOLVERS}, got {solver!r}")
        if solver == "backward" and not self.is_backward_looking:
            raise ValueError("backward solver requested but the model has "
                             "forward-looking (t+1) terms")

        theta = self.default_theta(**updates)
        linearize = self.linearizer(loglin_variables)

        sol = jax.jit(self.ss_solver)(theta)
        if not bool(sol.success) and on_failure == "error":
            raise RuntimeError(
                f"steady state failed (residual norm {float(sol.resid_norm):.3e})")
        lin = jax.jit(linearize)(sol.x_ss, sol.theta_full)
        A, B, C, D = lin.A, lin.B, lin.C, lin.D

        eu = None
        if solver == "gensys":
            res = jax.jit(self.gensys_solver)(A, B, C, D)
            T, R = res.T, res.R
            eu = (1 if bool(res.existence) else 0,
                  1 if bool(res.uniqueness) else -1)
            success = bool(res.success)
            if verbose:
                _log.info(interpret_eu(eu))
        elif solver == "gensys_host":
            T_np, R_np, eu = solve_policy_gensys(
                np.asarray(A), np.asarray(B), np.asarray(C), np.asarray(D))
            success = eu[0] == 1 and eu[1] == 1 and np.all(np.isfinite(T_np))
            T, R = jnp.asarray(T_np), jnp.asarray(R_np)
            if verbose:
                _log.info(interpret_eu(eu))
        elif solver == "backward":
            T, R, ok = jax.jit(solve_policy_backward)(A, B, D)
            success = bool(ok)
        else:
            from ..ops.static_reduction import solve_policy_reduced

            plan = self.static_reduction
            T, R, ok, n_iter, resid = jax.jit(
                lambda a, b, c, d: solve_policy_reduced(
                    a, b, c, d, plan, tol=tol, maxiter=maxiter))(A, B, C, D)
            success = bool(ok)
            if auto and not success:
                # cycle reduction needs a nonsingular reduced B; fall back
                # to the generalized-Schur (disk-split) solver
                res = jax.jit(self.gensys_solver)(A, B, C, D)
                if bool(res.success):
                    solver = "gensys"
                    T, R = res.T, res.R
                    eu = (1, 1)
                    success = True
                    if verbose:
                        _log.info("cycle reduction failed; gensys fallback "
                                  "succeeded")

        det_norm = float(jnp.max(jnp.abs(A + B @ T + C @ T @ T)))
        stoch_norm = float(jnp.max(jnp.abs((B + C @ T) @ R + D)))
        rho = float(spectral_radius(T))
        success = bool(success) and bool(sol.success)

        if not success and on_failure == "error":
            msg = f"policy solution failed (solver={solver}"
            if eu is not None:
                msg += f", {interpret_eu(eu)}"
            raise RuntimeError(msg + ")")
        if verbose and success:
            _log.info("Solved with %s: det norm %.2e, stoch norm %.2e",
                      solver, det_norm, stoch_norm)

        names = self.variables
        values = np.asarray(sol.x_ss)
        ss = SteadyStateResults(
            {v.to_ss(): float(values[i])
             for i, v in enumerate(self.functions.variables)},
            success=bool(sol.success), resid_norm=float(sol.resid_norm))
        return PolicySolution(
            T=pd.DataFrame(np.asarray(T), index=names, columns=names),
            R=pd.DataFrame(np.asarray(R), index=names, columns=self.shocks),
            success=success,
            solver=solver,
            deterministic_norm=det_norm,
            stochastic_norm=stoch_norm,
            spectral_radius=rho,
            eu=eu,
            steady_state=ss,
            loglin_scale=np.asarray(lin.loglin_scale),
        )

    def solve_model_second_order(
        self,
        loglin_variables="auto",
        shock_std=None,
        shock_cov=None,
        solution: PolicySolution | None = None,
        verbose: bool = False,
        **updates,
    ):
        """Second-order perturbation (beyond reference parity; the reference
        is first-order only — see ``models/second_order.py`` for the method).

        Returns ``(PolicySolution, SecondOrderResult)``: the first-order
        T/R plus the quadratic blocks G_xx/G_xu/G_uu and the uncertainty
        correction g_ss (computed from the shock covariance — pass
        ``shock_std`` or ``shock_cov``, default std 0.01 per shock).
        """
        from ..stats.covariance import build_shock_cov
        from .second_order import make_second_order_solver

        if solution is None:
            solution = self.solve_model(loglin_variables=loglin_variables,
                                        verbose=verbose, **updates)
        theta = self.default_theta(**updates)
        sol_ss = jax.jit(self.ss_solver)(theta)
        resolved_loglin = (self.default_loglin if loglin_variables == "auto"
                          else loglin_variables)
        key = ("second_order",
               resolved_loglin if isinstance(resolved_loglin, bool)
               else tuple(sorted(resolved_loglin)))
        if key not in self._solvers:
            self._solvers[key] = jax.jit(make_second_order_solver(
                self.functions, resolved_loglin))
        T = jnp.asarray(solution.T.to_numpy())
        R = jnp.asarray(solution.R.to_numpy())
        Q = build_shock_cov(self.n_shocks, shock_std, shock_cov, dtype=T.dtype)
        res2 = self._solvers[key](sol_ss.x_ss, sol_ss.theta_full, T, R, Q)
        if not bool(res2.success):
            _log.warning("second-order solve did not converge cleanly")
        return solution, res2

    # ------------------------------------------------------------- diagnostics
    def check_bk_condition(self, verbose: bool = True, **updates) -> pd.DataFrame:
        """Blanchard-Kahn eigenvalue table (host-side QZ diagnostic).

        Role parity with ``gEconpy/model/perturbation.py:412``.
        """
        from scipy.linalg import ordqz

        from ..ops.gensys_np import gensys_setup

        lin = self.linearize_model(**updates)
        A, B, C, D = (lin[k].to_numpy() for k in "ABCD")
        g0, g1, _, _, pi, lead_idx = gensys_setup(A, B, C, D)
        AA, BB, alpha, beta, _, _ = ordqz(g0, g1, output="complex")
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(alpha) > 1e-13, beta / alpha, np.inf)
        moduli = np.abs(lam)
        n_unstable = int(np.sum(moduli > 1.0 + 1e-9))
        n_forward = len(lead_idx)
        satisfied = n_unstable == n_forward
        if verbose:
            _log.info("BK condition: %d unstable roots, %d forward-looking "
                      "variables -> %s", n_unstable, n_forward,
                      "satisfied" if satisfied else "VIOLATED")
        order = np.argsort(moduli)
        df = pd.DataFrame({
            "real": np.real(lam)[order],
            "imag": np.imag(lam)[order],
            "modulus": moduli[order],
        })
        df.attrs["bk_satisfied"] = satisfied
        df.attrs["n_unstable"] = n_unstable
        df.attrs["n_forward"] = n_forward
        return df

    def build_report(self) -> str:
        """Human-readable summary of the compiled model
        (role parity with gEconpy/model/build.py:748)."""
        from ..utils.reporting import build_report

        report = build_report(self)
        print(report)
        return report

    def _repr_html_(self) -> str:
        from ..utils.reporting import model_to_html

        return model_to_html(self)

    def __repr__(self):
        return (f"Model(variables={self.n_variables}, shocks={self.n_shocks}, "
                f"free_params={len(self.functions.free_params)}, "
                f"calibrated={len(self.functions.calibrated_params)})")


def model_from_gcn(source_or_path, verbose: bool = True, **kwargs) -> Model:
    """Build a Model from GCN source text or a file path."""
    text = str(source_or_path)
    if "\n" not in text and text.endswith(".gcn"):
        primitives = load_gcn_file(text, **kwargs)
    else:
        primitives = load_gcn(text, **kwargs)
    model = Model(primitives)
    if verbose:
        _log.info("Model compiled: %d equations, %d variables, %d shocks, "
                  "%d free parameters",
                  len(primitives.equations), model.n_variables,
                  model.n_shocks, len(model.param_names))
    return model
