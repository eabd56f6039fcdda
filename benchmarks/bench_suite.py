"""Timing suite for every pipeline stage, asv-style.

Role parity with the reference's airspeed-velocity suite
(``/root/reference/benchmarks/``: bench_parse, bench_build,
bench_steady_state, bench_solve, bench_model, perfect_foresight/bench_solve)
— ``time_*`` cases per stage, parameterized over model and solver.  Runs
standalone (``python benchmarks/bench_suite.py``) printing a table, and each
``time_*`` method is asv-compatible.

Device cases compile once in ``setup`` so steady-state timings measure the
execution hot path, as in estimation.

``--profile [dir]`` wraps every timed case in a ``jax.profiler`` trace
(default ``/tmp/geconpy_tpu_trace``); open the dump with Perfetto
(ui.perfetto.dev) or TensorBoard's profile plugin to see per-op device
timelines — the SURVEY §5 asv-analog trace hook.  One-liner:

    python benchmarks/bench_suite.py --profile /tmp/trace
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


MODELS = ["rbc", "nk_3eq", "nk_full"]
SOLVERS = ["cycle_reduction", "gensys"]


def _median_time(fn, n_reps=7, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


class TimeParse:
    params = MODELS
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu

        self.src = geconpy_tpu.get_example_gcn(model_name)

    def time_parse(self, model_name):
        from geconpy_tpu.lang import parse_gcn

        parse_gcn(self.src)


class TimeBuild:
    params = MODELS
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu

        self.src = geconpy_tpu.get_example_gcn(model_name)

    def time_build(self, model_name):
        """Full symbolic build: parse -> FOC -> primitives -> JAX lowering."""
        import geconpy_tpu

        model = geconpy_tpu.model_from_gcn(self.src, verbose=False)
        _ = model.functions


class TimeSteadyState:
    params = MODELS
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu

        model = geconpy_tpu.model_from_gcn(
            geconpy_tpu.get_example_gcn(model_name), verbose=False)
        self.theta = model.default_theta()
        self.solver = jax.jit(model.ss_solver)
        jax.block_until_ready(self.solver(self.theta))  # compile

    def time_steady_state(self, model_name):
        jax.block_until_ready(self.solver(self.theta))


class TimeSolve:
    params = (MODELS, SOLVERS)
    param_names = ["model", "solver"]

    def setup(self, model_name, solver):
        import geconpy_tpu
        from geconpy_tpu.ops.cycle_reduction import solve_policy_cycle_reduction

        model = geconpy_tpu.model_from_gcn(
            geconpy_tpu.get_example_gcn(model_name), verbose=False)
        theta = model.default_theta()
        linearize = model.linearizer()
        if solver == "gensys":
            policy = model.gensys_solver
        else:
            policy = solve_policy_cycle_reduction

        def full(theta):
            sol = model.ss_solver(theta)
            lin = linearize(sol.x_ss, sol.theta_full)
            return policy(lin.A, lin.B, lin.C, lin.D)

        self.fn = jax.jit(full)
        self.theta = theta
        jax.block_until_ready(self.fn(theta))

    def time_solve(self, model_name, solver):
        jax.block_until_ready(self.fn(self.theta))


class TimeLoglik:
    """Solve + 200-period Kalman log-likelihood (the estimation hot path)."""

    params = MODELS
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu
        from geconpy_tpu.stats.statespace import DSGEStateSpace

        model = geconpy_tpu.model_from_gcn(
            geconpy_tpu.get_example_gcn(model_name), verbose=False)
        ss = DSGEStateSpace(model)
        obs = [model.variables[0]]
        kwargs = {}
        if model_name == "rbc":
            obs = ["Y"]
        elif model_name == "nk_3eq":
            obs = ["pi", "x"]
        elif model_name == "nk_full":
            obs = ["Y", "pi", "R"]
            kwargs["constant_params"] = ["sigma_C", "sigma_L", "h_C",
                                         "gamma_I", "alpha", "psi_p",
                                         "rho_pref", "sigma_pref"]
        if model_name == "rbc":
            kwargs["shock_std"] = 0.01
            kwargs["measurement_error"] = {"Y": 0.001}
        ss.configure(observed_states=obs, **kwargs)
        data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
        self.u = ss.unconstrain(draw)
        # AOT: the compiled handle also carries XLA's buffer assignment,
        # which is the peakmem column (see utils/memory.py)
        self.compiled = jax.jit(ss.build_logpost(data)).lower(self.u).compile()
        jax.block_until_ready(self.compiled(self.u))

    def time_loglik(self, model_name):
        jax.block_until_ready(self.compiled(self.u))

    def mem_report(self):
        from geconpy_tpu.utils.memory import compiled_memory_summary

        return compiled_memory_summary(self.compiled)


class TimeSecondOrder:
    params = ["rbc", "nk_full"]
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu

        self.model = geconpy_tpu.model_from_gcn(
            geconpy_tpu.get_example_gcn(model_name), verbose=False)
        self.sol = self.model.solve_model(verbose=False)
        # warm call compiles the Hessian + quadratic-Sylvester path
        self.model.solve_model_second_order(solution=self.sol,
                                            shock_std=0.01)

    def time_second_order(self, model_name):
        _, res2 = self.model.solve_model_second_order(solution=self.sol,
                                                      shock_std=0.01)
        import jax

        jax.block_until_ready(res2.G_xx)


class TimeUKFLoglik:
    """Second-order (pruned) UKF log posterior — the order-2 estimation hot
    path (marginalized Rao-Blackwellized filter, stats/nonlinear.py)."""

    params = ["rbc_estimation"]
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu
        from geconpy_tpu.stats.statespace import DSGEStateSpace

        model = geconpy_tpu.model_from_gcn(
            geconpy_tpu.get_example_gcn(model_name), verbose=False)
        ss = DSGEStateSpace(model)
        ss.configure(observed_states=["Y", "C"],
                     measurement_error=["Y", "C"])
        data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
        self.u = ss.unconstrain(draw)
        self.compiled = jax.jit(
            ss.build_logpost_second_order(data)).lower(self.u).compile()
        jax.block_until_ready(self.compiled(self.u))

    def time_ukf_loglik(self, model_name):
        jax.block_until_ready(self.compiled(self.u))

    def mem_report(self):
        from geconpy_tpu.utils.memory import compiled_memory_summary

        return compiled_memory_summary(self.compiled)


class TimePerfectForesight:
    params = ["rbc"]
    param_names = ["model"]

    def setup(self, model_name):
        import geconpy_tpu

        self.model = geconpy_tpu.model_from_gcn(
            geconpy_tpu.get_example_gcn(model_name), verbose=False)
        # one warm call compiles
        from geconpy_tpu.analysis.perfect_foresight import solve_perfect_foresight

        self._solve = solve_perfect_foresight
        self._solve(self.model, periods=100,
                    shocks={"epsilon_A": np.array([0.01])})

    def time_perfect_foresight(self, model_name):
        self._solve(self.model, periods=100,
                    shocks={"epsilon_A": np.array([0.01])})


def main():
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        trace_dir = (sys.argv[i + 1] if len(sys.argv) > i + 1
                     else "/tmp/geconpy_tpu_trace")
        profile_ctx = jax.profiler.trace(trace_dir)
        print(f"profiling to {trace_dir}")

    rows = []
    with profile_ctx:
        return _run_cases(rows)


def _run_cases(rows):
    for cls in [TimeParse, TimeBuild, TimeSteadyState, TimeSolve, TimeLoglik,
                TimeSecondOrder, TimeUKFLoglik, TimePerfectForesight]:
        params = cls.params
        if isinstance(params[0], (list, tuple)):
            combos = [(m, s) for m in params[0] for s in params[1]]
        else:
            combos = [(m,) for m in params]
        for combo in combos:
            case = cls()
            try:
                case.setup(*combo)
            except Exception as err:  # pragma: no cover
                rows.append((cls.__name__, combo, f"setup failed: {err}"))
                continue
            method = [m for m in dir(case) if m.startswith("time_")][0]
            t = _median_time(lambda: getattr(case, method)(*combo))
            cell = f"{t * 1e3:.3f} ms"
            if hasattr(case, "mem_report"):
                # peakmem analog (reference: asv peakmem_* cases) — XLA's
                # compile-time device-buffer high-watermark per program
                from geconpy_tpu.utils.memory import format_bytes

                mem = case.mem_report()
                cell += (f"  peak {format_bytes(mem['peak_bytes'])}"
                         f" (temp {format_bytes(mem['temp_bytes'])})")
            rows.append((cls.__name__, combo, cell))
            print(f"{cls.__name__:>22} {str(combo):>32}: {rows[-1][2]}")
    return rows


if __name__ == "__main__":
    main()
