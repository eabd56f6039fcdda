"""DSGE state-space model for Bayesian estimation.

Role parity with ``gEconpy/model/statespace.py`` (DSGEStateSpace:51,
configure:822, make_symbolic_graph:725, build_statespace_graph:1139) — but
instead of lowering to a PyMC/pytensor graph, ``configure`` produces ONE
jittable function

    theta (unconstrained) -> log posterior + diagnostics

whose body is: priors -> parameters -> steady state (analytic or implicit
Newton) -> jacfwd linearization -> cycle-reduction policy solve (custom_vjp)
-> Q/Z/H assembly -> doubling-Lyapunov P0 -> lax.scan Kalman log-likelihood.
Failed draws (steady state, policy, stability) get -inf log posterior — the
flag-gating that replaces the reference's BK/solver-residual Potential terms
(``model/statespace.py:1206-1215``).  The function is vmapped over chains by
the NUTS layer and shard_mapped over devices by the parallel layer.
"""

from __future__ import annotations

import functools
import hashlib
import logging
from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dists import CompositeDistribution, Distribution, HalfNormal, resolve_priors
from ..models.model import Model
from ..models.perturbation import spectral_radius
from ..ops.cycle_reduction import selection_matrix, cycle_reduction
from ..ops.kalman import kalman_filter
from ..ops.precision import highest_precision
from ..ops.lyapunov import solve_discrete_lyapunov

_log = logging.getLogger(__name__)

__all__ = ["DSGEStateSpace", "EstimatedParameter", "LogPostExtras",
           "statespace_from_gcn", "data_from_prior"]


def _cached_builder(method):
    """Memoize a ``build_*(data, **kwargs)`` method on (data, kwargs).

    Returning the SAME function object for identical inputs is what lets
    downstream jit caches hit on repeat calls: ``fit`` twice with the same
    model + data reuses every compiled XLA executable (the NUTS sampler
    programs key on logpost identity — see ``stats/nuts.py`` sampler cache).
    The cache is cleared by :meth:`DSGEStateSpace.configure`.
    """
    @functools.wraps(method)
    def wrapper(self, data, **kwargs):
        arr = np.asarray(data)
        try:
            cache_kwargs = tuple(sorted(kwargs.items()))
            hash(cache_kwargs)
        except TypeError:           # unhashable kwarg: skip caching
            return method(self, data, **kwargs)
        key = (method.__name__, arr.shape, arr.dtype.str,
               hashlib.sha1(arr.tobytes()).hexdigest(), cache_kwargs)
        cache = self.__dict__.setdefault("_builder_cache", {})
        if key not in cache:
            cache[key] = method(self, data, **kwargs)
        return cache[key]
    return wrapper


@dataclass(frozen=True)
class EstimatedParameter:
    name: str
    prior: Distribution
    kind: str                     # "model" | "measurement_error"
    initial: float | None = None


class LogPostExtras(NamedTuple):
    """Per-draw diagnostics recorded alongside the log posterior — the
    analog of the reference's Deterministic trace nodes
    (deterministic_norm / stochastic_norm / bk_satisfied / policy success)."""

    logpost: jax.Array
    loglik: jax.Array
    logprior: jax.Array
    ss_success: jax.Array
    solver_success: jax.Array
    deterministic_norm: jax.Array
    stochastic_norm: jax.Array
    spectral_radius: jax.Array


class DSGEStateSpace:
    """Estimation-ready state-space wrapper around a :class:`Model`."""

    def __init__(self, model: Model):
        self.model = model
        self._configured = False

    # ------------------------------------------------------------- configure
    def configure(
        self,
        observed_states: list[str],
        measurement_error: list[str] | dict | None = None,
        shock_std: dict | float | None = None,
        solver: str = "cycle_reduction",
        filter_type: str = "sequential",
        kalman_settle: int = 48,
        kalman_settle_method: str = "hewer",
        loglin_variables="auto",
        cycle_reduction_tol: float = 1e-10,
        cycle_reduction_maxiter: int = 100,
        me_prior: Distribution | None = None,
        constant_params: list[str] | None = None,
        observation_equations: dict[str, str] | None = None,
        aggregate: dict[str, tuple[str, str, int]] | None = None,
        ss_obs_intercept: bool = False,
        full_shock_covariance: bool = False,
        lkj_eta: float = 1.0,
        p0_init: str = "stationary",
        diffuse_kappa: float = 1e6,
        diffuse_presample: int = 0,
    ) -> "DSGEStateSpace":
        """Choose observables, measurement error, and estimated parameters.

        - Parameters with GCN priors are estimated; everything else is frozen
          at its calibrated value (``constant_params`` can freeze more).
        - Shock standard deviations come from GCN shock priors (hyper-
          parameter links — CompositeDistribution) or fixed via ``shock_std``.
        - ``measurement_error``: list of observed names (each gets an
          estimated std with ``me_prior``, default HalfNormal(0.1)) or a dict
          name -> float (fixed) / Distribution (estimated).
        - ``observation_equations``: synthetic observables defined by GCN
          expressions in model variables (lags allowed), e.g.
          ``{"dY": "Y[] - Y[-1]"}``; linearized symbolically around the
          steady state, with automatic lag-block state augmentation (role
          parity with gEconpy/model/statespace.py:390-509,652).
        - ``aggregate``: temporal aggregation sugar:
          ``{"Y_q": ("Y", "sum", 3)}`` builds the lag-polynomial observation
          equation for a flow observed every 3rd period (use
          prepare_mixed_frequency_data to NaN-pad the data).
        - ``ss_obs_intercept``: include the steady-state observation
          intercept d (otherwise the data must be demeaned deviations).
          For a directly-observed log-linearized variable the intercept is
          ``log(v_ss)`` (data in logs); for level-linearized variables it
          is ``v_ss`` (data in levels) — reference parity with
          ``gEconpy/model/statespace.py:334`` ``_make_obs_intercept``.
          Observation-equation rows use the equation's own value at the
          steady state, in the equation's units.
        - ``full_shock_covariance``: estimate a full (correlated) shock
          covariance Q = S L Lᵀ S instead of diagonal — S = diag of the
          per-shock stds (GCN priors / shock_std as before), L the
          correlation Cholesky factor built from canonical partial
          correlations with an LKJ(``lkj_eta``) prior.  Role parity with the
          reference's full PSD state_cov
          (``gEconpy/model/statespace.py:240,827``), TPU-first
          parameterization (unconstrained scalars, exact log-jacobians, no
          PSD projection needed).
        - ``kalman_settle_method`` (``filter_type="stationary"`` only):
          how the DARE settle reaches its fixed point — ``"hewer"``
          (default, fastest measured at SW-2007 scale), ``"sda"``
          (structure-preserving doubling, uncertified draws rejected), or
          ``"auto"`` (SDA + Hewer fallback); see
          ``ops.kalman.stationary_kalman_loglik`` and ``_sda_settle`` for
          the measured trade-off.
        - ``p0_init="diffuse"``: approximate-diffuse filter initialization
          P0 = ``diffuse_kappa`` * I instead of the stationary Lyapunov
          covariance, for models with (near-)unit roots — the stability
          gate then admits unit roots (but not explosive ones), and the
          first ``diffuse_presample`` periods' likelihood contributions are
          dropped (set it >= the number of diffuse states to approximate
          the exact-diffuse likelihood).  Requires ``filter_type=
          "sequential"`` or ``"parallel"``.
        """
        model = self.model
        mf = model.functions

        if p0_init not in ("stationary", "diffuse"):
            raise ValueError(f"p0_init must be 'stationary' or 'diffuse', "
                             f"got {p0_init!r}")
        if p0_init == "diffuse" and filter_type not in ("sequential",
                                                        "parallel"):
            raise ValueError("p0_init='diffuse' requires filter_type="
                             "'sequential' or 'parallel' (the constant-gain "
                             "filters assume stationarity)")
        self.p0_init = p0_init
        self.diffuse_kappa = float(diffuse_kappa)
        self.diffuse_presample = int(diffuse_presample)

        observation_equations = dict(observation_equations or {})
        for obs_name, (var, method, period) in (aggregate or {}).items():
            observation_equations[obs_name] = aggregated_obs_equation(
                var, method, period)

        unknown_obs = set(observed_states) - set(mf.variable_names) \
            - set(observation_equations)
        if unknown_obs:
            raise ValueError(f"observed_states not in model: {sorted(unknown_obs)}")
        self.observed_states = list(observed_states)
        if filter_type not in ("sequential", "parallel", "steady_state",
                               "stationary", "chandrasekhar"):
            raise ValueError("filter_type must be 'sequential', 'parallel', "
                             "'steady_state', 'stationary' or 'chandrasekhar'")
        self.filter_type = filter_type
        self.kalman_settle = int(kalman_settle)
        if kalman_settle_method not in ("auto", "sda", "hewer"):
            raise ValueError("kalman_settle_method must be 'auto', 'sda' or "
                             f"'hewer', got {kalman_settle_method!r}")
        self.kalman_settle_method = kalman_settle_method
        self.ss_obs_intercept = ss_obs_intercept
        self._setup_observation_equations(observation_equations)
        self.solver = solver
        self._cr_tol = cycle_reduction_tol
        self._cr_maxiter = cycle_reduction_maxiter
        self.loglin_variables = loglin_variables

        param_priors, shock_dists = resolve_priors(
            model.primitives.priors, model.primitives.shock_priors)
        constant = set(constant_params or ())

        # ---- estimated model parameters (those with priors, minus frozen)
        self.estimated: list[EstimatedParameter] = []
        free_names = [p.name for p in mf.free_params]
        defaults = np.asarray(model.default_theta())
        self._theta_default = jnp.asarray(defaults)
        est_idx: list[int] = []
        for i, name in enumerate(free_names):
            if name in param_priors and name not in constant:
                self.estimated.append(EstimatedParameter(
                    name, param_priors[name], "model", float(defaults[i])))
                est_idx.append(i)
        self._est_idx = jnp.asarray(est_idx, dtype=jnp.int32) if est_idx else None

        # ---- shock covariance wiring
        shock_names = mf.shock_names
        sigma_source: list[tuple[str, object]] = []  # ("param", idx) | ("fixed", val)
        for s in shock_names:
            dist = shock_dists.get(s)
            if isinstance(dist, CompositeDistribution) and dist.sigma_param:
                pname = dist.sigma_param
                if pname not in free_names:
                    raise ValueError(
                        f"shock {s!r} references hyper-parameter {pname!r} "
                        f"which is not a model parameter")
                sigma_source.append(("param", free_names.index(pname)))
            elif isinstance(dist, Distribution):
                sigma_source.append(("fixed", float(dist.std())))
            else:
                if isinstance(shock_std, dict):
                    sigma_source.append(("fixed", float(shock_std.get(s, 0.01))))
                elif shock_std is not None:
                    sigma_source.append(("fixed", float(shock_std)))
                else:
                    sigma_source.append(("fixed", 0.01))
        self._sigma_source = sigma_source

        # ---- measurement error
        me_prior = me_prior or HalfNormal(sigma=0.1)
        self._me_fixed: dict[int, float] = {}
        me_estimated: list[tuple[int, EstimatedParameter]] = []
        if measurement_error:
            if isinstance(measurement_error, dict):
                items = measurement_error.items()
            else:
                items = [(name, me_prior) for name in measurement_error]
            for name, spec in items:
                if name not in self.observed_states:
                    raise ValueError(
                        f"measurement error on {name!r} but it is not observed")
                j = self.observed_states.index(name)
                if isinstance(spec, (int, float)):
                    self._me_fixed[j] = float(spec)
                else:
                    me_estimated.append((j, EstimatedParameter(
                        f"sigma_obs_{name}", spec, "measurement_error")))
        self._me_estimated = me_estimated
        self.estimated.extend(p for _, p in me_estimated)

        # ---- full shock covariance: partial-correlation parameters with
        # the LKJ(eta) vine marginals, one per lower-triangular (i, j)
        self.full_shock_covariance = bool(full_shock_covariance)
        corr_params: list[EstimatedParameter] = []
        if full_shock_covariance:
            from ..dists import PartialCorrelation

            m = mf.n_shocks
            for i in range(1, m):
                for j in range(i):
                    prior = PartialCorrelation.lkj_marginal(lkj_eta, m, j)
                    corr_params.append(EstimatedParameter(
                        f"corr_{shock_names[i]}_{shock_names[j]}", prior,
                        "shock_corr", 0.0))
        self._n_corr = len(corr_params)
        self.estimated.extend(corr_params)

        # ---- stochastic singularity check
        n_me = len(self._me_fixed) + len(me_estimated)
        if len(self.observed_states) > mf.n_shocks + n_me:
            raise ValueError(
                f"stochastic singularity: {len(self.observed_states)} observables "
                f"but only {mf.n_shocks} shocks + {n_me} measurement errors. "
                f"Add shocks or measurement error.")

        # ---- filter-core reduction: when every observable references only
        # dynamic variables (no static loads), the Kalman state can be the
        # dynamic core of the policy (statics are outputs, not states)
        plan = model.static_reduction
        dynamic_names = {mf.variable_names[i] for i in plan.dynamic_idx}
        obs_refs: set[str] = set()
        for name in self.observed_states:
            if name in self._obs_fns:
                continue
            obs_refs.add(name)
        if observation_equations:
            from ..lang.parser import parse_expression
            from ..lang.sympify import SympyConverter
            from ..symbolic import TimeAwareSymbol

            conv = SympyConverter(model.primitives.assumptions)
            for src in observation_equations.values():
                expr = conv.convert(parse_expression(src))
                obs_refs |= {a.base_name for a in expr.atoms(TimeAwareSymbol)}
        if self.solver == "cycle_reduction" and obs_refs <= dynamic_names \
                and len(plan.static_idx):
            self._filter_core = np.asarray(plan.dynamic_idx)
        else:
            self._filter_core = np.arange(mf.n_variables)

        k = len(self.observed_states)
        self.__dict__.pop("_builder_cache", None)   # built fns are now stale
        self._configured = True
        _log.info("configured: %d observables, %d estimated parameters "
                  "(%d model + %d meas. error)", k, len(self.estimated),
                  len(est_idx), len(me_estimated))
        return self


    # ------------------------------------------------- observation equations
    def _setup_observation_equations(self, observation_equations: dict) -> None:
        """Parse + symbolically differentiate synthetic observables.

        Each observable row becomes a set of coefficient functions over the
        lag blocks [y_t, y_{t-1}, ..., y_{t-L}] (L = deepest lag used) plus a
        steady-state intercept; coefficients are exact jacfwd derivatives of
        the lowered expression at the steady state, with log-linearization
        chain-rule scaling applied at runtime.
        """
        from ..codegen.lower import lower_to_jax
        from ..lang.parser import parse_expression
        from ..lang.sympify import SympyConverter
        from ..symbolic import TimeAwareSymbol

        mf = self.model.functions
        self._obs_eq_names = list(observation_equations)
        if not observation_equations:
            self._obs_max_lag = 0
            self._obs_fns = {}
            return

        converter = SympyConverter(self.model.primitives.assumptions)
        parsed = {}
        max_lag = 0
        var_names = set(mf.variable_names)
        for name, src in observation_equations.items():
            expr = converter.convert(parse_expression(src))
            for atom in expr.atoms(TimeAwareSymbol):
                if atom.base_name not in var_names:
                    raise ValueError(
                        f"observation equation {name!r} references unknown "
                        f"variable {atom.base_name!r}")
                if atom.time_index == "ss":
                    continue
                if atom.time_index > 0:
                    raise ValueError(
                        f"observation equation {name!r} may not reference "
                        f"future values ({atom})")
                max_lag = max(max_lag, -atom.time_index)
            parsed[name] = expr
        self._obs_max_lag = max_lag

        # one lowered function per observable: g(y_0, y_1, ..., y_L, theta)
        lag_groups = [
            (f"y_lag{j}", [v.set_t(-j) for v in mf.variables])
            for j in range(max_lag + 1)
        ]
        theta_syms = mf.param_symbols
        self._obs_fns = {
            name: lower_to_jax([expr], lag_groups + [("theta", theta_syms)],
                               name=f"obs_{name}")
            for name, expr in parsed.items()
        }

    def _build_design(self, x_ss, theta_full, scale, core=None):
        """(Z, d): design over the lag-augmented filter state and the SS
        intercept.

        Z has shape (k_obs, (L+1) * n_core) where n_core is the filter core
        (the dynamic variables when no observable loads on statics, else all
        variables); observation-equation rows get exact jacfwd coefficients
        times the log-linearization scale (chain rule dy/dy_hat = scale).
        """
        from ..models.perturbation import _ZERO_TOL, make_loglin_mask

        mf = self.model.functions
        n = mf.n_variables
        if core is None:
            core = getattr(self, "_filter_core", np.arange(n))
        core_j = jnp.asarray(core, dtype=jnp.int32)
        n_core = len(core)
        L = self._obs_max_lag
        k = len(self.observed_states)
        dtype = x_ss.dtype
        lv = self.loglin_variables
        if isinstance(lv, str) and lv == "auto":
            lv = self.model.default_loglin
        loglin_mask = make_loglin_mask(mf, lv)
        rows = []
        intercepts = []
        ss_blocks = [x_ss] * (L + 1)
        for name in self.observed_states:
            if name in self._obs_fns:
                fn = self._obs_fns[name]
                grads = [
                    jax.jacfwd(fn.fn, argnums=j)(*ss_blocks, theta_full)[0]
                    for j in range(L + 1)
                ]
                row = jnp.concatenate([(g * scale)[core_j] for g in grads])
                intercept = fn.fn(*ss_blocks, theta_full)[0]
            else:
                idx = mf.variable_names.index(name)
                full_row = jnp.zeros((n,), dtype).at[idx].set(1.0)
                row = jnp.zeros(((L + 1) * n_core,), dtype) \
                    .at[:n_core].set(full_row[core_j])
                # a log-linearized state is a LOG deviation, so the data for
                # a directly-observed variable are logs and the intercept is
                # log(v_ss) — matching the reference's convention
                # (gEconpy/model/statespace.py:334-380 _make_obs_intercept);
                # level-linearized variables (incl. the runtime fallback for
                # non-positive steady states) keep the level intercept v_ss
                x_v = x_ss[idx]
                if loglin_mask[idx]:
                    intercept = jnp.where(
                        x_v > _ZERO_TOL,
                        jnp.log(jnp.maximum(x_v, jnp.asarray(1e-30, dtype))),
                        x_v)
                else:
                    intercept = x_v
            rows.append(row)
            intercepts.append(intercept)
        Z = jnp.stack(rows)
        d = jnp.stack(intercepts) if self.ss_obs_intercept \
            else jnp.zeros((k,), dtype)
        return Z, d

    @staticmethod
    def _augment_lags(T, R, L):
        """Companion augmentation: state [y_t, y_{t-1}, ..., y_{t-L}]."""
        if L == 0:
            return T, R
        n = T.shape[0]
        dtype = T.dtype
        m = (L + 1) * n
        T_aug = jnp.zeros((m, m), dtype)
        T_aug = T_aug.at[:n, :n].set(T)
        for j in range(L):
            T_aug = T_aug.at[(j + 1) * n:(j + 2) * n, j * n:(j + 1) * n].set(
                jnp.eye(n, dtype=dtype))
        R_aug = jnp.zeros((m, R.shape[1]), dtype).at[:n, :].set(R)
        return T_aug, R_aug

    # ----------------------------------------------------------------- sizes
    @property
    def n_estimated(self) -> int:
        """Number of estimated parameters (the NUTS dimension)."""
        return len(self.estimated)

    @property
    def param_labels(self) -> list[str]:
        """Estimated-parameter names, the column order of posterior draws."""
        return [p.name for p in self.estimated]

    # ------------------------------------------------------------ transforms
    def unconstrain(self, values: np.ndarray | dict) -> jnp.ndarray:
        """Constrained parameter values -> unconstrained vector."""
        if isinstance(values, dict):
            values = np.array([values[p.name] for p in self.estimated])
        out = []
        for p, v in zip(self.estimated, np.asarray(values)):
            out.append(float(p.prior.to_unconstrained(jnp.asarray(v))))
        return jnp.asarray(out)

    def constrain(self, u: jnp.ndarray) -> jnp.ndarray:
        """Unconstrained sampler vector -> constrained parameter values."""
        xs = []
        for i, p in enumerate(self.estimated):
            x, _ = p.prior.from_unconstrained(u[i])
            xs.append(x)
        return jnp.stack(xs)

    def initial_position(self, jitter: float = 0.0, key=None) -> jnp.ndarray:
        """Unconstrained start: prior mean (or GCN initial value)."""
        vals = []
        for p in self.estimated:
            v = p.initial if p.initial is not None else p.prior.mean()
            if not np.isfinite(v):
                v = float(p.prior.ppf(0.5))
            vals.append(v)
        u = self.unconstrain(np.asarray(vals))
        if jitter and key is not None:
            u = u + jitter * jax.random.normal(key, u.shape)
        return u

    # ------------------------------------------------------------------ logp
    @_cached_builder
    def build_logpost(self, data: np.ndarray) -> Callable[[jnp.ndarray], jax.Array]:
        """data (periods, k_obs), NaN = missing -> logpost(u) function."""
        extras_fn = self.build_logpost_extras(data)

        def logpost(u):
            return extras_fn(u).logpost

        return logpost

    def build_solution_fn(self, full_state: bool = False
                          ) -> Callable[[jnp.ndarray], dict]:
        """Jittable ``u (unconstrained) -> full state-space solution dict``.

        Returns every per-draw quantity the posterior tooling needs:
        theta_full, x_ss, policy (T, R) and augmented (T_aug, R_aug),
        design Z / intercept d, covariances Q / H, logprior, success flags,
        and the residual-norm diagnostics.  ``build_logpost_extras`` is a
        thin Kalman-likelihood layer over this.
        """
        pre_policy, policy, post_policy = self._solution_pieces(full_state)

        def solve_draw(u: jnp.ndarray) -> dict:
            pre = pre_policy(u)
            T, R, solver_ok = policy(pre)
            return post_policy(pre, T, R, solver_ok)

        return solve_draw

    def _solution_pieces(self, full_state: bool = False):
        """The solution pipeline split at the policy solve, so batched
        sweeps can swap the vmapped XLA policy step for the lane-batched
        Pallas cycle-reduction kernel: (pre_policy, policy, post_policy)."""
        if not self._configured:
            raise RuntimeError("call .configure(...) first")
        model = self.model
        ss_solver = model.ss_solver
        linearize = model.linearizer(self.loglin_variables)
        k = len(self.observed_states)
        obs_max_lag = self._obs_max_lag
        n_model_est = len([p for p in self.estimated if p.kind == "model"])
        est_idx = self._est_idx
        theta_default = self._theta_default
        sigma_source = self._sigma_source
        me_fixed = self._me_fixed
        me_estimated = self._me_estimated
        n_corr = getattr(self, "_n_corr", 0)
        n_shocks = self.model.functions.n_shocks
        priors = [p.prior for p in self.estimated]
        cr_tol, cr_maxiter = self._cr_tol, self._cr_maxiter
        use_backward = self.solver == "backward"
        use_gensys = self.solver == "gensys"
        gensys_solver = model.gensys_solver if use_gensys else None
        if full_state:
            filter_core = np.arange(model.functions.n_variables)
        else:
            filter_core = self._filter_core

        @highest_precision
        def pre_policy(u: jnp.ndarray) -> dict:
            dtype = u.dtype
            # unconstrained -> constrained + prior logpdf with jacobian
            logprior = jnp.asarray(0.0, dtype)
            xs = []
            for i, prior in enumerate(priors):
                x_i, logjac = prior.from_unconstrained(u[i])
                logprior = logprior + prior.logpdf(x_i) + logjac
                xs.append(x_i)
            x = jnp.stack(xs) if xs else jnp.zeros((0,), dtype)

            theta_free = theta_default.astype(dtype)
            if est_idx is not None:
                theta_free = theta_free.at[est_idx].set(x[:n_model_est])

            # steady state -> linearize
            ss = ss_solver(theta_free)
            lin = linearize(ss.x_ss, ss.theta_full)
            return {"x": x, "logprior": logprior, "theta_full": ss.theta_full,
                    "x_ss": ss.x_ss, "ss_success": ss.success,
                    "A": lin.A, "B": lin.B, "C": lin.C, "D": lin.D,
                    "loglin_scale": lin.loglin_scale}

        @highest_precision
        def policy(pre: dict):
            if use_backward:
                T = -jnp.linalg.solve(pre["B"], pre["A"])
                R = -jnp.linalg.solve(pre["B"], pre["D"])
                solver_ok = jnp.all(jnp.isfinite(T)) & jnp.all(jnp.isfinite(R))
            elif use_gensys:
                gres = gensys_solver(pre["A"], pre["B"], pre["C"], pre["D"])
                T, R = gres.T, gres.R
                solver_ok = gres.success
            else:
                from ..ops.static_reduction import solve_policy_reduced

                T, R, solver_ok, _n_iter, _resid = solve_policy_reduced(
                    pre["A"], pre["B"], pre["C"], pre["D"],
                    model.static_reduction, tol=cr_tol, maxiter=cr_maxiter)
            return T, R, solver_ok

        @highest_precision
        def post_policy(pre: dict, T, R, solver_ok) -> dict:
            x = pre["x"]
            dtype = x.dtype
            lin_A, lin_B, lin_C, lin_D = (pre["A"], pre["B"], pre["C"],
                                          pre["D"])
            rho = spectral_radius(jax.lax.stop_gradient(T))
            diffuse = getattr(self, "p0_init", "stationary") == "diffuse"
            # diffuse init admits unit roots (random walks) but not
            # explosive dynamics; the Gelfand estimate overshoots by
            # O(log k / k) on defective unit eigenvalues, hence the slack
            rho_max = 1.0 + 1e-3 if diffuse else 1.0 - 1e-9
            stable = jnp.isfinite(rho) & (rho < rho_max)

            det_norm = jnp.max(jnp.abs(lin_A + lin_B @ T + lin_C @ T @ T))
            stoch_norm = jnp.max(jnp.abs((lin_B + lin_C @ T) @ R + lin_D))
            if diffuse:
                # cycle reduction converges only linearly at unit roots, so
                # its internal criterion can flag failure on an EXACT
                # solvent; the residual is ground truth, and explosive
                # impostors are rejected by the stability gate above
                from ..ops.tolerances import success_tol

                tol = success_tol(dtype, 1e-7)
                exact = ((det_norm < tol) & (stoch_norm < tol)
                         & jnp.all(jnp.isfinite(T))
                         & jnp.all(jnp.isfinite(R)))
                solver_ok = solver_ok | (exact & stable)

            # shock covariance
            sigmas = []
            for kind, val in sigma_source:
                if kind == "param":
                    sigmas.append(pre["theta_full"][val])
                else:
                    sigmas.append(jnp.asarray(val, dtype))
            sig = jnp.stack(sigmas)
            if n_corr:
                # full Q = S L Lᵀ S: vine construction of the correlation
                # Cholesky L from the canonical partial correlations (the
                # trailing n_corr entries of x)
                z_flat = x[x.shape[0] - n_corr:]
                L = jnp.zeros((n_shocks, n_shocks), dtype)
                L = L.at[0, 0].set(jnp.asarray(1.0, dtype))
                slot = 0
                for i in range(1, n_shocks):
                    w = jnp.asarray(1.0, dtype)
                    for j in range(i):
                        z = z_flat[slot]
                        slot += 1
                        L = L.at[i, j].set(z * w)
                        w = w * jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
                    L = L.at[i, i].set(w)
                Lq = sig[:, None] * L
                Q = Lq @ Lq.T
            else:
                Q = jnp.diag(sig**2)

            # measurement error covariance
            h_diag = jnp.zeros((k,), dtype)
            for j, v in me_fixed.items():
                h_diag = h_diag.at[j].set(v**2)
            for slot, (j, _p) in enumerate(me_estimated):
                h_diag = h_diag.at[j].set(x[n_model_est + slot] ** 2)
            H = jnp.diag(h_diag)

            # design matrix / intercept from observation equations (exact
            # jacfwd coefficients at the SS) + lag-block state augmentation.
            # The filter state is the dynamic core when observables permit.
            core = jnp.asarray(filter_core, dtype=jnp.int32)
            T_f = T[jnp.ix_(core, core)]
            R_f = R[core, :]
            Z, d_vec = self._build_design(pre["x_ss"], pre["theta_full"],
                                          pre["loglin_scale"],
                                          core=filter_core)
            # guard the Lyapunov solve against explosive T
            T_safe = jnp.where(stable, T_f, jnp.zeros_like(T_f))
            T_aug, R_aug = self._augment_lags(T_safe, R_f, obs_max_lag)

            return {
                "x": x,
                "theta_full": pre["theta_full"],
                "x_ss": pre["x_ss"],
                "T": T,
                "R": R,
                "T_aug": T_aug,
                "R_aug": R_aug,
                "Z": Z.astype(dtype),
                "d": d_vec,
                "Q": Q,
                "H": H,
                "logprior": pre["logprior"],
                "ss_success": pre["ss_success"],
                "solver_success": solver_ok,
                "stable": stable,
                "deterministic_norm": det_norm,
                "stochastic_norm": stoch_norm,
                "spectral_radius": rho,
            }

        return pre_policy, policy, post_policy

    def _data_and_loglik(self, data: np.ndarray):
        """Validate the dataset and pick the (differentiable, XLA) Kalman
        log-likelihood implementation for the configured filter_type."""
        y = jnp.asarray(data)
        if y.ndim != 2 or y.shape[1] != len(self.observed_states):
            raise ValueError(
                f"data must be (periods, {len(self.observed_states)}), got {y.shape}")
        filter_type = getattr(self, "filter_type", "sequential")
        if filter_type in ("steady_state", "stationary", "chandrasekhar") \
                and bool(np.isnan(data).any()):
            if filter_type == "stationary":
                # mixed-frequency data: a periodic missingness pattern keeps
                # the constant-gain fast path via the cyclostationary filter
                # (periodic DARE, one frozen gain per phase)
                from ..ops.cyclo_kalman import (
                    cyclostationary_kalman_loglik, detect_mask_period)

                finite_mask = np.isfinite(np.asarray(data))
                p = detect_mask_period(finite_mask)
                if p is None:
                    raise ValueError(
                        "filter_type='stationary' with missing data requires "
                        "a periodic missingness pattern (mixed-frequency, "
                        "see prepare_mixed_frequency_data); use 'sequential' "
                        "for arbitrary missingness")
                pattern = finite_mask[:p]

                def _loglik(y_, T_, R_, Q_, Z_, H_, d=None):
                    return cyclostationary_kalman_loglik(
                        y_, T_, R_, Q_, Z_, H_, d=d, mask_pattern=pattern,
                        n_settle=self.kalman_settle)

                return y, _loglik
            raise ValueError(f"filter_type={filter_type!r} requires fully "
                             "observed data (no NaN); use 'sequential' or "
                             "'stationary' (periodic patterns only)")
        if filter_type == "stationary":
            import functools

            from ..ops.kalman import stationary_kalman_loglik

            def _loglik(y_, T_, R_, Q_, Z_, H_, d=None):
                return stationary_kalman_loglik(
                    y_, T_, R_, Q_, Z_, H_, d=d,
                    n_settle=self.kalman_settle,
                    settle_method=getattr(self, "kalman_settle_method",
                                          "hewer"))
        elif filter_type == "chandrasekhar":
            from ..ops.chandrasekhar import chandrasekhar_loglik as _loglik
        elif filter_type == "parallel":
            from ..ops.parallel_kalman import parallel_kalman_filter

            if getattr(self, "p0_init", "stationary") == "diffuse":
                kappa, pre = self.diffuse_kappa, self.diffuse_presample

                def _loglik(y_, T_, R_, Q_, Z_, H_, d=None):
                    P0 = kappa * jnp.eye(T_.shape[0], dtype=T_.dtype)
                    res = parallel_kalman_filter(y_, T_, R_, Q_, Z_, H_,
                                                 d=d, P0=P0)
                    return jnp.sum(res.loglik_t[pre:])
            else:
                def _loglik(*args, **kw):
                    return parallel_kalman_filter(*args, **kw).loglik
        elif filter_type == "steady_state":
            import functools

            from ..ops.kalman import steady_state_kalman_loglik

            _loglik = functools.partial(steady_state_kalman_loglik,
                                        n_settle=self.kalman_settle)
        elif getattr(self, "p0_init", "stationary") == "diffuse":
            kappa, pre = self.diffuse_kappa, self.diffuse_presample

            def _loglik(y_, T_, R_, Q_, Z_, H_, d=None):
                P0 = kappa * jnp.eye(T_.shape[0], dtype=T_.dtype)
                res = kalman_filter(y_, T_, R_, Q_, Z_, H_, d=d, P0=P0)
                return jnp.sum(res.loglik_t[pre:])
        else:
            def _loglik(*args, **kw):
                return kalman_filter(*args, **kw).loglik
        return y, _loglik

    @_cached_builder
    def build_logpost_extras(self, data: np.ndarray
                             ) -> Callable[[jnp.ndarray], LogPostExtras]:
        """``u -> LogPostExtras``: log posterior plus the per-draw
        diagnostics (success flags, residual norms, spectral radius)."""
        y, _loglik = self._data_and_loglik(data)
        solve_draw = self.build_solution_fn()

        @highest_precision
        def extras(u: jnp.ndarray) -> LogPostExtras:
            dtype = u.dtype
            sol = solve_draw(u)
            loglik = _loglik(y, sol["T_aug"], sol["R_aug"], sol["Q"],
                             sol["Z"], sol["H"], d=sol["d"])
            logprior = sol["logprior"]
            ok = sol["ss_success"] & sol["solver_success"] & sol["stable"] \
                & jnp.isfinite(loglik) & jnp.isfinite(logprior)
            logpost = jnp.where(ok, loglik + logprior,
                                jnp.asarray(-jnp.inf, dtype))
            return LogPostExtras(
                logpost=logpost,
                loglik=loglik,
                logprior=logprior,
                ss_success=sol["ss_success"],
                solver_success=sol["solver_success"],
                deterministic_norm=sol["deterministic_norm"],
                stochastic_norm=sol["stochastic_norm"],
                spectral_radius=sol["spectral_radius"],
            )

        return extras

    # ------------------------------------------------ second-order estimation
    def build_logpost_second_order(self, data: np.ndarray, **kwargs
                                   ) -> Callable[[jnp.ndarray], jax.Array]:
        """Differentiable log posterior of the pruned second-order solution
        via the unscented Kalman filter — same gating semantics as
        :meth:`build_logpost`, usable directly as a NUTS target.  See
        ``stats/nonlinear.py`` (beyond-parity: the reference estimates
        first-order solutions only)."""
        from .nonlinear import build_logpost_second_order

        return build_logpost_second_order(self, data, **kwargs)

    def build_pf_loglik_second_order(self, data: np.ndarray, **kwargs
                                     ) -> Callable:
        """``(u, key) -> (loglik, success)`` unbiased particle-filter
        marginal likelihood of the pruned second-order system (PMMH /
        UKF-approximation checks).  See ``stats/nonlinear.py``."""
        from .nonlinear import build_pf_loglik_second_order

        return build_pf_loglik_second_order(self, data, **kwargs)

    def build_second_order_solution_fn(self) -> Callable[[jnp.ndarray], dict]:
        """Jittable ``u -> pruned second-order solution dict`` (stats/nonlinear.py)."""
        from .nonlinear import build_second_order_solution_fn

        return build_second_order_solution_fn(self)

    # ----------------------------------------------------- batched sweeps
    @_cached_builder
    def build_batched_loglik(self, data: np.ndarray, n_settle: int = 32,
                             pallas_tile: int = 512,
                             policy: str = "xla",
                             settle: str = "xla",
                             cr_tile: int = 128,
                             cr_iters: int = 14,
                             interpret: bool = False):
        """Gradient-free batched log-posterior for big sweeps.

        ``f(U) -> (B,)`` where U is (B, n_estimated) unconstrained draws.
        The per-draw solve + settle phase is vmapped XLA; the constant-gain
        filter tail runs in the fused Pallas kernel
        (:mod:`geconpy_tpu.ops.pallas_filter`) with the batch in the vector
        lanes — the prior/posterior-predictive sweep and benchmark hot path.

        ``policy="pallas"`` additionally replaces the vmapped XLA
        cycle-reduction (lockstep batched LU per iteration, the dominant
        cost) with the lane-batched Pallas Gauss-Jordan kernel
        (:mod:`geconpy_tpu.ops.pallas_cycle_reduction`); the batch size must
        then be a multiple of ``cr_tile`` lanes or is padded to one.
        Requires the model to have static variables or not, either way the
        solve runs on the reduced dynamic pencil.  For gradients (NUTS) use
        ``build_logpost``.
        """
        if bool(np.isnan(data).any()):
            raise ValueError("build_batched_loglik requires fully observed data")
        if policy not in ("xla", "pallas"):
            raise ValueError(f"policy must be 'xla' or 'pallas', got {policy!r}")
        if settle not in ("xla", "pallas", "fused"):
            raise ValueError(
                f"settle must be 'xla', 'pallas' or 'fused', got {settle!r}")
        if policy == "pallas" and self.solver not in ("cycle_reduction",):
            raise ValueError("policy='pallas' requires solver='cycle_reduction'")
        y = jnp.asarray(data)
        y_head, y_tail = y[:n_settle], y[n_settle:]

        from ..ops.kalman import steady_state_filter_parts
        from ..ops.pallas_filter import pallas_filter_tail
        from ..ops.pallas_settle import (pallas_settle_filter_loglik,
                                         pallas_settle_parts)

        pre_policy, policy_fn, post_policy = self._solution_pieces()

        def per_draw_tail(sol):
            ll_head, x_pred0, M, TK, Finv, const = steady_state_filter_parts(
                y_head.astype(sol["T_aug"].dtype), sol["T_aug"], sol["R_aug"],
                sol["Q"], sol["Z"], sol["H"], d=sol["d"])
            ok = sol["ss_success"] & sol["solver_success"] & sol["stable"]
            return (ll_head, sol["logprior"], ok, x_pred0, M, TK, Finv,
                    const, sol["Z"], sol["d"])

        def batched_settle(sol, dtype):
            """Whole-batch settle phase in the Pallas Riccati kernel."""
            RQR = jax.vmap(lambda r, q: r @ q @ r.T)(sol["R_aug"], sol["Q"])
            ll_head, x_pred0, M, TK, Finv, const = pallas_settle_parts(
                y_head.astype(dtype), sol["T_aug"], RQR, sol["Z"],
                sol["H"], sol["d"], tile=cr_tile, interpret=interpret)
            ok = sol["ss_success"] & sol["solver_success"] & sol["stable"]
            return (ll_head, sol["logprior"], ok, x_pred0, M, TK, Finv,
                    const, sol["Z"], sol["d"])

        if policy == "pallas":
            solve_batch = self._build_pallas_policy_batch(cr_tile, cr_iters,
                                                          interpret)

            def solved(U):
                pre = jax.vmap(pre_policy)(U)
                T, R, solver_ok = solve_batch(pre)
                sol = jax.vmap(post_policy)(pre, T, R, solver_ok)
                return sol
        else:
            solve_draw = self.build_solution_fn()

            def solved(U):
                return jax.vmap(solve_draw)(U)

        def batched(U):
            sol = solved(U)
            if settle == "fused":
                # one kernel: settle + constant-gain tail, full loglik
                RQR = jax.vmap(lambda r, q: r @ q @ r.T)(sol["R_aug"],
                                                         sol["Q"])
                ll = pallas_settle_filter_loglik(
                    y.astype(U.dtype), sol["T_aug"], RQR, sol["Z"],
                    sol["H"], sol["d"], n_settle=n_settle, tile=cr_tile,
                    interpret=interpret)
                ok = sol["ss_success"] & sol["solver_success"] & sol["stable"]
                ll = ll + sol["logprior"]
                return jnp.where(ok & jnp.isfinite(ll), ll, -jnp.inf)
            if settle == "pallas":
                (ll_head, logprior, ok, x_pred0, M, TK, Finv, const, Zb,
                 db) = batched_settle(sol, U.dtype)
            else:
                (ll_head, logprior, ok, x_pred0, M, TK, Finv, const, Zb,
                 db) = jax.vmap(per_draw_tail)(sol)
            ll_tail = pallas_filter_tail(
                y_tail.astype(U.dtype), M, TK, Zb, db, Finv, const, x_pred0,
                tile=pallas_tile, interpret=interpret)
            ll = ll_head + ll_tail + logprior
            ll = jnp.where(ok & jnp.isfinite(ll), ll, -jnp.inf)
            return ll

        return batched

    @_cached_builder
    def build_batched_logpost(self, data: np.ndarray,
                              cr_tile: int = 128, cr_iters: int = 14,
                              interpret: bool = False,
                              settle: str = "xla"):
        """DIFFERENTIABLE batched log-posterior ``f(U) -> (B,)``.

        The forward pass runs the lane-batched Pallas cycle-reduction kernel
        (the sweep/benchmark hot path); the backward pass is the analytic
        implicit-function adjoint (Smith-doubling Sylvester solve), so
        ``jax.grad``/``jax.vjp`` work and NUTS chains can run their
        value+grad hot loop on the same kernels as the prior sweeps.

        ``cr_iters`` (default 14) is the kernel's static doubling count:
        convergence decays like ``|lambda_max|^(2^k)``, so 14 converges any
        draw with spectral radius <= 0.999 below float32 tolerance, and the
        kernel folds the TRUE policy residual ``max|A + B T + C T^2|`` into
        its success flag — an unconverged draw is rejected (-inf), never
        silently wrong.  Raise it for models whose posterior mass reaches
        |lambda| > 0.999 (each +2 iterations squares the boundary's
        distance to 1; measured cost ~0.5 us/draw/iteration at batch 512).

        With ``filter_type="stationary"``, ``settle="pallas"`` runs the
        primal DARE settle as a lane-batched Pallas kernel
        (``ops/pallas_dare.py``) — gradients re-attach at the fixed point
        through the implicit DARE adjoint, so the kernel needs no backward
        pass.  Measured on SW-2007 at batch 512 the kernel LOSES to the
        default ``settle="xla"`` adaptive Hewer settle (51.4 vs ~41
        us/draw: the settle is matmul-bound, which XLA already batches onto
        the MXU; lane layout only wins over sequential per-element ops like
        LU pivoting), and its fixed-length schedule cannot early-exit per
        lane — convergence is checked outside the kernel and un-settled
        lanes rejected as -inf — so XLA is the default.

        The Kalman likelihood is otherwise the configured XLA filter
        (differentiated by autodiff), identical math to
        :meth:`build_logpost`; the paths agree in value and gradient (see
        tests/stats/test_pallas_grad.py).
        """
        if self.solver != "cycle_reduction":
            raise ValueError("build_batched_logpost requires "
                             "solver='cycle_reduction'")
        if settle not in ("pallas", "xla"):
            raise ValueError(f"settle must be 'pallas' or 'xla', got {settle!r}")
        y, _loglik = self._data_and_loglik(data)
        pre_policy, _, post_policy = self._solution_pieces()
        solve_batch = self._build_pallas_policy_batch_diff(
            cr_tile, cr_iters, interpret)

        use_pallas_dare = (settle == "pallas"
                           and getattr(self, "filter_type", "") == "stationary"
                           and not bool(np.isnan(data).any()))

        @highest_precision
        def per_draw_ll(sol):
            dtype = sol["T_aug"].dtype
            loglik = _loglik(y.astype(dtype), sol["T_aug"], sol["R_aug"],
                             sol["Q"], sol["Z"], sol["H"], d=sol["d"])
            logprior = sol["logprior"]
            ok = sol["ss_success"] & sol["solver_success"] & sol["stable"] \
                & jnp.isfinite(loglik) & jnp.isfinite(logprior)
            return jnp.where(ok, loglik + logprior,
                             jnp.asarray(-jnp.inf, dtype))

        if use_pallas_dare:
            from ..ops.kalman import (dare_residual_settled,
                                      stationary_loglik_from_P)
            from ..ops.pallas_dare import pallas_dare_settle

            @highest_precision
            def per_draw_ll_P(sol, RQR, P, settled):
                dtype = sol["T_aug"].dtype
                n = sol["T_aug"].shape[0]
                loglik = stationary_loglik_from_P(
                    y.astype(dtype), sol["T_aug"], RQR, sol["Z"], sol["H"],
                    sol["d"], jnp.zeros((n,), dtype), P)
                logprior = sol["logprior"]
                ok = sol["ss_success"] & sol["solver_success"] \
                    & sol["stable"] & settled & jnp.isfinite(loglik) \
                    & jnp.isfinite(logprior)
                return jnp.where(ok, loglik + logprior,
                                 jnp.asarray(-jnp.inf, dtype))

            def batched(U):
                pre = jax.vmap(pre_policy)(U)
                T, R, ok = solve_batch(pre)
                sol = jax.vmap(post_policy)(pre, T, R, ok)
                RQR = jax.vmap(lambda r, q: r @ q @ r.T)(sol["R_aug"],
                                                         sol["Q"])
                sg = jax.lax.stop_gradient
                P_b = pallas_dare_settle(sg(sol["T_aug"]), sg(RQR),
                                         sg(sol["Z"]), sg(sol["H"]),
                                         tile=cr_tile, interpret=interpret)
                # the fixed-length kernel cannot early-exit per lane, so
                # convergence is verified outside and un-settled lanes are
                # rejected as -inf (never silently biased)
                settled = jax.vmap(dare_residual_settled)(
                    sg(sol["T_aug"]), sg(RQR), sg(sol["Z"]), sg(sol["H"]),
                    P_b)
                return jax.vmap(per_draw_ll_P)(sol, RQR, P_b, settled)

            return batched

        def batched(U):
            pre = jax.vmap(pre_policy)(U)
            T, R, ok = solve_batch(pre)
            sol = jax.vmap(post_policy)(pre, T, R, ok)
            return jax.vmap(per_draw_ll)(sol)

        return batched

    @_cached_builder
    def build_batched_logpost_and_grad(self, data: np.ndarray, **kwargs):
        """``f(U) -> (logpost (B,), grad (B, dim))`` — one Pallas forward +
        one analytic-adjoint backward over the whole batch.  Non-finite
        gradients (rejected draws) are zeroed, matching the NUTS kernel's
        convention."""
        f = self.build_batched_logpost(data, **kwargs)

        def value_and_grad(U):
            vals, vjp = jax.vjp(f, U)
            (grads,) = vjp(jnp.ones_like(vals))
            grads = jnp.where(jnp.isfinite(grads), grads,
                              jnp.zeros_like(grads))
            return vals, grads

        return value_and_grad

    def _static_pivot_order(self) -> np.ndarray:
        """Host-side static GJ row ordering from the calibration pencil."""
        if getattr(self, "_pivot_order", None) is None:
            from ..ops.pallas_cycle_reduction import static_pivot_order
            from ..ops.static_reduction import reduce_pencil

            pre_policy, _, _ = self._solution_pieces()
            pre = jax.jit(pre_policy)(self.initial_position())
            plan = self.model.static_reduction
            if len(plan.static_idx) > 0:
                red = reduce_pencil(pre["A"], pre["B"], pre["C"], plan)
                B2 = np.asarray(red.B2, np.float64)
            else:
                B2 = np.asarray(pre["B"], np.float64)
            self._pivot_order = static_pivot_order(B2)
        return self._pivot_order

    def _build_pallas_policy_batch_diff(self, cr_tile: int, cr_iters: int,
                                        interpret: bool):
        """Differentiable batched policy solve: the lane-batched Pallas
        cycle-reduction kernel computes the primal solvent T; gradients
        re-attach at the full-system level through the analytic implicit
        adjoint (``ops.static_reduction.finalize_reduced_policy`` — the same
        ``custom_vjp`` the XLA path uses), and the shock-selection matrix R
        comes from the differentiable XLA solve.  This is what lets NUTS run
        its value+grad hot loop on the sweep kernels.

        Reference role: the policy adjoint that makes estimation fast
        (``gEconpy/solvers/shared.py:12``).
        """
        from ..ops.pallas_cycle_reduction import pallas_cycle_reduction
        from ..ops.static_reduction import (finalize_reduced_policy,
                                            policy_from_reduced,
                                            reduce_pencil)

        plan = self.model.static_reduction
        order = self._static_pivot_order()
        n = self.model.functions.n_variables
        has_statics = len(plan.static_idx) > 0

        def solve_batch(pre):
            A, B, C, D = pre["A"], pre["B"], pre["C"], pre["D"]
            As, Bs, Cs = (jax.lax.stop_gradient(m) for m in (A, B, C))
            if has_statics:
                red = jax.vmap(
                    lambda a, b, c: reduce_pencil(a, b, c, plan))(As, Bs, Cs)
                T_d, cr_ok = pallas_cycle_reduction(
                    red.A2, red.B2, red.C2, order=order, n_iter=cr_iters,
                    tile=cr_tile, interpret=interpret)
                T_primal = jax.vmap(
                    lambda t, r: policy_from_reduced(t, r, plan, n))(T_d, red)
            else:
                T_d, cr_ok = pallas_cycle_reduction(
                    As, Bs, Cs, order=order, n_iter=cr_iters, tile=cr_tile,
                    interpret=interpret)
                T_primal = T_d
            T, R, success, _resid = jax.vmap(finalize_reduced_policy)(
                A, B, C, D, T_primal, T_d, cr_ok)
            return T, R, success

        return solve_batch

    def _build_pallas_policy_batch(self, cr_tile: int, cr_iters: int,
                                   interpret: bool):
        """Batched policy solve: vmapped QR reduction -> one Pallas
        cycle-reduction + selection call over the whole batch -> vmapped
        static back-substitution.  The kernel's pivot/tail/residual flags
        subsume the XLA-side residual recomputation; only the stability
        check (spectral radius of T_d) runs outside.  Primal-only (sweeps).
        """
        from ..ops.pallas_cycle_reduction import pallas_cycle_reduction_policy
        from ..ops.static_reduction import expand_reduced_policy, reduce_pencil
        from ..models.perturbation import spectral_radius

        plan = self.model.static_reduction
        order = self._static_pivot_order()
        n = self.model.functions.n_variables

        has_statics = len(plan.static_idx) > 0

        def solve_batch(pre):
            A, B, C, D = pre["A"], pre["B"], pre["C"], pre["D"]
            if has_statics:
                red = jax.vmap(
                    lambda a, b, c, d: reduce_pencil(a, b, c, plan, D=d))(
                    A, B, C, D)
                A2, B2, C2, D2 = red.A2, red.B2, red.C2, red.D2
            else:
                red = None
                A2, B2, C2, D2 = A, B, C, D
            T_d, R_d, cr_ok, _resid = pallas_cycle_reduction_policy(
                A2, B2, C2, D2, order=order, n_iter=cr_iters, tile=cr_tile,
                interpret=interpret)

            rho = jax.vmap(spectral_radius)(T_d)
            stable_ok = jnp.isfinite(rho) & (rho < 1.0 + 1e-6)

            if has_statics:
                T, R = jax.vmap(
                    lambda t, r, red_i: expand_reduced_policy(
                        t, r, red_i, plan, n))(T_d, R_d, red)
            else:
                T, R = T_d, R_d
            success = cr_ok & stable_ok \
                & jax.vmap(lambda r: jnp.all(jnp.isfinite(r)))(R)
            return T, R, success

        return solve_batch

    # ------------------------------------------------------ filter/smoother
    def filter_data(self, data: np.ndarray, params: dict | None = None,
                    smoother: bool = False):
        """Kalman-filter (or RTS-smooth) the data at one parameter point.

        ``params`` maps estimated-parameter names to constrained values
        (defaults to prior means / GCN initial values).  Returns a pandas
        DataFrame of state paths labeled by variable, plus the loglik in
        ``df.attrs["loglik"]``.  Role parity with the reference's
        filtered/smoothed output used by plot_kalman_filter.
        """
        import pandas as pd

        from ..ops.kalman import kalman_filter as _kf
        from ..ops.kalman import kalman_smoother as _ks

        if params is None:
            u = self.initial_position()
        else:
            vals = []
            for p_ in self.estimated:
                if p_.name in params:
                    vals.append(float(params[p_.name]))
                else:
                    v = p_.initial if p_.initial is not None else p_.prior.mean()
                    vals.append(float(v))
            u = self.unconstrain(np.asarray(vals))
        sol = jax.jit(self.build_solution_fn(full_state=True))(u)
        y = jnp.asarray(data)
        res = _kf(y, sol["T_aug"], sol["R_aug"], sol["Q"], sol["Z"],
                  sol["H"], d=sol["d"])
        n = self.model.functions.n_variables
        if smoother:
            sm = _ks(y, sol["T_aug"], sol["R_aug"], sol["Q"], sol["Z"],
                     sol["H"], d=sol["d"])
            paths = np.asarray(sm.smoothed_mean)[:, :n]
        else:
            paths = np.asarray(res.filtered_mean)[:, :n]
        df = pd.DataFrame(paths, columns=self.model.functions.variable_names)
        df.attrs["loglik"] = float(res.loglik)
        return df

    # ------------------------------------------------------- prior utilities
    def sample_prior(self, key, n_draws: int = 1000) -> dict[str, np.ndarray]:
        """Monte-Carlo prior draws per estimated parameter (constrained space)."""
        keys = jax.random.split(key, len(self.estimated))
        return {
            p.name: np.asarray(p.prior.sample(keys[i], (n_draws,)))
            for i, p in enumerate(self.estimated)
        }

    def data_from_prior(self, key, periods: int = 200,
                        params: dict | None = None,
                        pct_missing: float = 0.0):
        """Simulate an artificial dataset from one prior draw.

        Role parity with ``gEconpy/model/statespace.py:1324`` including its
        ``pct_missing``: that fraction of observation cells is NaN-ed out
        uniformly at random (the missing-data Kalman filter handles them
        exactly — test fixtures for ragged panels).  ``params`` pins chosen
        estimated parameters to given values instead of sampling them
        (controlled simulation studies / well-identified test fixtures).
        Returns (data (periods, k_obs), draw dict).
        """
        if not 0.0 <= pct_missing < 1.0:
            raise ValueError(f"pct_missing must be in [0, 1), got {pct_missing}")
        k_draw, k_sim, k_obs_noise, k_miss = jax.random.split(key, 4)
        draw = {p.name: float(np.asarray(p.prior.sample(k)))
                for p, k in zip(self.estimated,
                                jax.random.split(k_draw, len(self.estimated)))}
        if params:
            unknown = set(params) - set(draw)
            if unknown:
                raise ValueError(
                    f"params not estimated here: {sorted(unknown)}")
            draw.update({k_: float(v) for k_, v in params.items()})
        # reuse the pipeline pieces directly for simulation
        mf = self.model.functions
        theta_free = np.asarray(self._theta_default).copy()
        free_names = [p.name for p in mf.free_params]
        for p in self.estimated:
            if p.kind == "model":
                theta_free[free_names.index(p.name)] = draw[p.name]
        sol = self.model.ss_solver(jnp.asarray(theta_free))
        lin = self.model.linearizer(self.loglin_variables)(sol.x_ss, sol.theta_full)
        cr = cycle_reduction(lin.A, lin.B, lin.C)
        R = selection_matrix(lin.B, lin.C, cr.T, lin.D)
        sigmas = []
        for kind, val in self._sigma_source:
            sigmas.append(float(sol.theta_full[val]) if kind == "param" else val)
        eps_std = np.asarray(jax.random.normal(k_sim, (periods, mf.n_shocks)))
        if getattr(self, "_n_corr", 0):
            z = [draw[p.name] for p in self.estimated if p.kind == "shock_corr"]
            L = _vine_cholesky_np(z, mf.n_shocks)
            eps = eps_std @ (np.asarray(sigmas)[:, None] * L).T
        else:
            eps = eps_std * np.asarray(sigmas)
        from ..analysis.simulate import simulate_linear

        T_aug, R_aug = self._augment_lags(cr.T, R, self._obs_max_lag)
        Z, d_vec = self._build_design(sol.x_ss, sol.theta_full,
                                      lin.loglin_scale,
                                      core=np.arange(mf.n_variables))
        path = np.asarray(simulate_linear(T_aug, R_aug, jnp.asarray(eps)))
        data = path @ np.asarray(Z).T + np.asarray(d_vec)[None, :]
        for j, v in self._me_fixed.items():
            data[:, j] += v * np.asarray(
                jax.random.normal(k_obs_noise, (periods,)))
        for slot, (j, p) in enumerate(self._me_estimated):
            data[:, j] += draw[p.name] * np.asarray(
                jax.random.normal(jax.random.fold_in(k_obs_noise, slot),
                                  (periods,)))
        if pct_missing > 0.0:
            mask = np.asarray(jax.random.uniform(k_miss, data.shape))
            data = np.where(mask < pct_missing, np.nan, data)
        return data, draw

def _vine_cholesky_np(z_flat, m: int) -> np.ndarray:
    """Correlation Cholesky factor from canonical partial correlations
    (host-side twin of the traced construction in post_policy)."""
    L = np.zeros((m, m))
    L[0, 0] = 1.0
    slot = 0
    for i in range(1, m):
        w = 1.0
        for j in range(i):
            z = float(z_flat[slot])
            slot += 1
            L[i, j] = z * w
            w *= np.sqrt(max(1.0 - z * z, 1e-12))
        L[i, i] = w
    return L


def aggregated_obs_equation(var: str, method: str, period: int) -> str:
    """GCN expression for a temporally aggregated observable.

    sum/mean aggregate a flow over ``period`` sub-periods via the lag
    polynomial; 'last' observes the current value, 'first' the oldest lag.
    Role parity with the reference's cumulator-state aggregation
    (gEconpy/model/statespace.py:598).
    """
    lags = [f"{var}[]" if j == 0 else f"{var}[-{j}]" for j in range(period)]
    if method == "sum":
        return " + ".join(lags)
    if method == "mean":
        return "(" + " + ".join(lags) + f") / {period}"
    if method == "last":
        return lags[0]
    if method == "first":
        return lags[-1]
    raise ValueError(f"unknown aggregation method {method!r}")


def statespace_from_gcn(source_or_path, verbose: bool = True,
                        **configure_kwargs) -> DSGEStateSpace:
    """Build a Model from GCN and wrap it for estimation in one call.

    Role parity with ``gEconpy/model/build.py:566`` (statespace_from_gcn).
    If ``configure_kwargs`` are given (at minimum ``observed_states``),
    ``configure`` runs immediately; otherwise call it yourself.
    """
    from ..models.model import model_from_gcn

    model = model_from_gcn(source_or_path, verbose=verbose)
    ss = DSGEStateSpace(model)
    if configure_kwargs:
        ss.configure(**configure_kwargs)
    return ss


def data_from_prior(statespace: DSGEStateSpace, key=None, periods: int = 200,
                    params: dict | None = None):
    """Standalone facade over :meth:`DSGEStateSpace.data_from_prior`
    (reference exports a module-level ``data_from_prior``,
    ``gEconpy/model/statespace.py:1324``)."""
    import jax as _jax

    if key is None:
        key = _jax.random.PRNGKey(0)
    return statespace.data_from_prior(key, periods=periods, params=params)
