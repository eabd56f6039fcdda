"""Headline benchmark: DSGE solve + Kalman log-likelihood throughput.

Measures, on the real TPU (float32):

1. ``value`` — evaluations/second/chip of the full estimation forward hot
   path: steady state -> jacfwd linearization -> cycle-reduction policy
   solve -> Lyapunov P0 -> 200-period Kalman filter log-likelihood, vmapped
   over 4096 parameter draws (the prior-sweep workload, BASELINE config 4).
2. ``value_grad_us_per_draw`` — microseconds per draw of the batched
   VALUE+GRADIENT at batch 512 (the NUTS leapfrog cost: Pallas forward +
   analytic-adjoint backward, ``filter_type="stationary"``).
3. ``ess_per_hr_full_block`` — NUTS minimum effective-sample-size per hour
   per chip on the FULL 22-parameter SW-2007 estimated block (exogenous
   block + habit/csigma/Taylor rule) with a dense mass matrix and pooled
   adaptation over 128 chains — the convergence artifact (max R-hat,
   diverging fraction ship in ``ess_detail``).  The timed pass reuses the
   compiled programs from a warmup pass (the statespace builder + sampler
   caches), so compile time is excluded; the stage also measures the cold
   vs warm (persistent-compilation-cache, fresh subprocess) first-fit wall
   and the HBM peaks of the flagship programs.

Prints ONE JSON line per completed stage — each line is a superset of the
previous, so the LAST parseable line is always the most complete result and
an early kill still leaves the headline metric on stdout.  A dead axon
tunnel produces a parseable ``{"skipped": ...}`` line and exit code 0,
never a traceback.

``--profile [dir]`` additionally dumps a jax.profiler trace of the headline
timing loop (default ``/tmp/geconpy_tpu_trace``; view with Perfetto /
TensorBoard).  ``BENCH_BUDGET_S`` (default 3300) soft-bounds total wall
time: stages that would start past the budget are skipped.

vs_baseline is measured against the driver's north-star target of
100 microseconds per draw per chip (BASELINE.md): vs_baseline > 1 beats it.
"""

import contextlib
import json
import os
import signal
import sys
import time

_T0 = time.time()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "5400"))
_RESULT = {
    "metric": "sw2007_solve_kalman200_loglik_evals_per_sec_per_chip",
    "value": None,
    "unit": "evals/s",
    "vs_baseline": None,
}


def _emit():
    print(json.dumps(_RESULT), flush=True)


def _remaining():
    return _BUDGET - (time.time() - _T0)


class _Deadline(Exception):
    pass


@contextlib.contextmanager
def _alarm(seconds: int):
    def handler(signum, frame):
        raise _Deadline(f"stage exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(1, int(seconds)))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _probe_tunnel():
    """Tiny matmul through the backend; raises on a dead tunnel."""
    import jax
    import jax.numpy as jnp

    with _alarm(240):
        x = jnp.ones((128, 128), jnp.float32)
        jax.block_until_ready(x @ x)
        return jax.devices()[0].platform


SW_OBS = ["y", "c", "inve", "w", "pinf", "r", "lab"]
SW_ESTIMATED_FULL = [
    "crhoa", "crhob", "crhog", "crhoqs", "crhoms", "crhopinf", "crhow",
    "cmap", "cmaw", "cgy", "sigma_ea", "sigma_eb", "sigma_eg", "sigma_eqs",
    "sigma_em", "sigma_epinf", "sigma_ew", "crpi", "crr", "cry", "chabb",
    "csigma"]
# identified exogenous block: AR coefficients + shock scales (a target that
# CONVERGES in a short warmup; see benchmarks/bench_ess.py)
SW_ESTIMATED_EXOG = [
    "crhoa", "crhob", "crhog", "crhoqs", "crhoms", "crhopinf", "crhow",
    "sigma_ea", "sigma_eb", "sigma_eg", "sigma_eqs", "sigma_em",
    "sigma_epinf", "sigma_ew"]


def _configured_ss(estimated, **configure_kwargs):
    import geconpy_tpu
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("sw2007"), verbose=False)
    constant = [p for p in model.param_names if p not in estimated]
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=SW_OBS, constant_params=constant,
                 **configure_kwargs)
    return ss


def _stage_forward(profile_dir=None):
    """Headline: batched forward sweep throughput, cross-checked against the
    independent gradient-capable logpost path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch_size, periods, n_reps = 4096, 200, 20
    ss = _configured_ss(SW_ESTIMATED_FULL, filter_type="steady_state",
                        kalman_settle=32)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=periods)
    u0 = ss.unconstrain(draw).astype(jnp.float32)
    batch = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (batch_size, u0.shape[0]), dtype=jnp.float32)
    data32 = np.asarray(data, dtype=np.float32)

    # batched sweep path: vmapped steady-state/linearize + lane-batched
    # Pallas cycle reduction + Pallas Riccati settle + fused Pallas
    # constant-gain filter tail.  AOT-compiled so the executable's buffer
    # assignment gives the HBM peak (the peakmem metric) for free.
    compiled = jax.jit(ss.build_batched_loglik(
        data32, n_settle=ss.kalman_settle, policy="pallas", settle="pallas")
    ).lower(batch).compile()
    from geconpy_tpu.utils.memory import compiled_memory_summary

    _RESULT.setdefault("hbm", {})["sweep_batch4096_peak_bytes"] = \
        compiled_memory_summary(compiled)["peak_bytes"]
    fn = compiled
    out = jax.block_until_ready(fn(batch))  # first run + sanity
    n_finite = int(jnp.sum(jnp.isfinite(out)))
    assert n_finite / batch_size >= 0.99, \
        f"only {n_finite}/{batch_size} finite logposts"

    # cross-check against the gradient-capable logpost path — same solve +
    # filter through independent XLA kernels — at a relative tolerance
    # defensible for a float32 200-period log-likelihood
    n_check = 512
    logpost = ss.build_logpost(data32)
    ref = np.asarray(jax.jit(jax.vmap(logpost))(batch[:n_check]))
    got = np.asarray(out[:n_check])
    both = np.isfinite(ref) & np.isfinite(got)
    assert both.mean() >= 0.99, f"finiteness mismatch ({both.mean():.3f})"
    rel = np.max(np.abs(got - ref)[both] / (1.0 + np.abs(ref[both])))
    assert rel < 5e-4, f"batched path off by rel {rel:.2e}"

    ctx = contextlib.nullcontext()
    if profile_dir is not None:
        ctx = jax.profiler.trace(profile_dir)
    with ctx:
        start = time.perf_counter()
        for _ in range(n_reps):
            out = fn(batch)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - start
    evals_per_sec = n_reps * batch_size / elapsed
    _RESULT["value"] = round(evals_per_sec, 1)
    _RESULT["vs_baseline"] = round(evals_per_sec * 100.0 / 1e6, 3)


def _stage_value_grad():
    """NUTS leapfrog cost: batched value+grad, stationary filter, batch 512."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    batch_size = 512
    ss = _configured_ss(SW_ESTIMATED_FULL, filter_type="stationary",
                        kalman_settle=32)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
    u0 = ss.unconstrain(draw).astype(jnp.float32)
    batch = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (batch_size, u0.shape[0]), dtype=jnp.float32)
    data32 = np.asarray(data, dtype=np.float32)

    vag = jax.jit(ss.build_batched_logpost_and_grad(data32)
                  ).lower(batch).compile()
    from geconpy_tpu.utils.memory import compiled_memory_summary

    _RESULT.setdefault("hbm", {})["value_grad_batch512_peak_bytes"] = \
        compiled_memory_summary(vag)["peak_bytes"]
    vals, grads = jax.block_until_ready(vag(batch))
    finite = int(jnp.sum(jnp.isfinite(vals)))
    assert finite / batch_size >= 0.99, f"{finite}/{batch_size} finite"

    n_reps = 10
    start = time.perf_counter()
    for _ in range(n_reps):
        vals, grads = vag(batch)
    jax.block_until_ready((vals, grads))
    dt = time.perf_counter() - start
    _RESULT["value_grad_us_per_draw"] = round(
        dt / (n_reps * batch_size) * 1e6, 2)


_ESS_CHAINS = int(os.environ.get("BENCH_ESS_CHAINS", "128"))
_ESS_WARMUP = int(os.environ.get("BENCH_ESS_WARMUP", "384"))
_ESS_SAMPLES = int(os.environ.get("BENCH_ESS_SAMPLES", "256"))


def _ess_fit_kwargs(num_chains, num_warmup, num_samples, seed):
    return dict(num_chains=num_chains, num_warmup=num_warmup,
                num_samples=num_samples, seed=seed, policy="pallas",
                pooled_adaptation=True, max_depth=8, init="map",
                target_accept=0.95, mass_matrix="dense",
                segment_size=25)  # bounded device programs through the tunnel


_WARM_CHILD = r"""
import sys, time
import numpy as np
import jax
import jax.monitoring
import geconpy_tpu
from geconpy_tpu import enable_persistent_cache
import bench

cache_dir, seed = sys.argv[1], int(sys.argv[2])
enable_persistent_cache(cache_dir)
hits = []
jax.monitoring.register_event_listener(
    lambda name, **kw: hits.append(name)
    if name == "/jax/compilation_cache/cache_hits" else None)
t0 = time.time()
ss = bench._configured_ss(bench.SW_ESTIMATED_FULL, filter_type="stationary",
                          kalman_settle=32)
data, _ = ss.data_from_prior(jax.random.PRNGKey(0), periods=200,
                             params=bench._sw_truth(ss))
t_build = time.time() - t0
t1 = time.time()
geconpy_tpu.fit(ss, np.asarray(data, np.float32),
                **bench._ess_fit_kwargs(bench._ESS_CHAINS, bench._ESS_WARMUP,
                                        bench._ESS_SAMPLES, seed))
print("WARM_FIRST_FIT_S", round(time.time() - t0, 1),
      round(t_build, 1), round(time.time() - t1, 1), len(hits))
"""


_SW_TRUTH = {
    # SW-2007-published-style values: informative data that pins the
    # weakly-identified MA parameters (prior-MEAN truth leaves cmap
    # bimodal/slow-mixing — measured R-hat ~1.03 vs 1.002 here)
    "crhoa": 0.95, "crhob": 0.2, "crhog": 0.95, "crhoqs": 0.7,
    "crhoms": 0.15, "crhopinf": 0.9, "crhow": 0.95, "cmap": 0.74,
    "cmaw": 0.88, "cgy": 0.5, "crpi": 2.0, "crr": 0.8, "cry": 0.1,
    "chabb": 0.7, "csigma": 1.4, "sigma_ea": 0.01, "sigma_eb": 0.01,
    "sigma_eg": 0.01, "sigma_eqs": 0.01, "sigma_em": 0.01,
    "sigma_epinf": 0.01, "sigma_ew": 0.01}


def _sw_truth(ss):
    """Data-generating parameter point for the full-block convergence
    artifact (every estimated parameter pinned)."""
    assert set(_SW_TRUTH) == {p.name for p in ss.estimated}
    return dict(_SW_TRUTH)


def _stage_ess():
    """Full-block SW-2007 NUTS convergence + throughput: all 22 estimated
    parameters (exogenous block + habit/csigma/Taylor rule), dense mass
    matrix, pooled adaptation — the workload the framework exists for.

    Three measurements:
    - cold first fit (fresh persistent-cache dir): compile + first run;
    - timed second fit (in-process caches): pure sampling -> ESS/hr,
      R-hat, divergence artifact;
    - warm first fit in a FRESH SUBPROCESS against the now-populated
      persistent cache: the cross-process compile-cache story.
    """
    import subprocess
    import tempfile

    import geconpy_tpu
    import jax
    import numpy as np
    from geconpy_tpu import enable_persistent_cache

    num_chains, num_warmup, num_samples = (_ESS_CHAINS, _ESS_WARMUP,
                                           _ESS_SAMPLES)
    # fresh dir => the first fit is an honest COLD measurement
    cache_dir = tempfile.mkdtemp(prefix="geconpy_xla_cache_")
    enable_persistent_cache(cache_dir)

    ss = _configured_ss(SW_ESTIMATED_FULL, filter_type="stationary",
                        kalman_settle=32)
    data, _ = ss.data_from_prior(jax.random.PRNGKey(0), periods=200,
                                 params=_sw_truth(ss))
    data32 = np.asarray(data, dtype=np.float32)

    def run(seed):
        return geconpy_tpu.fit(ss, data32, **_ess_fit_kwargs(
            num_chains, num_warmup, num_samples, seed))

    t0 = time.perf_counter()
    run(1)                       # compile pass (fills every program cache)
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    result = run(0)              # identical config: pure sampling time
    wall_s = time.perf_counter() - t0

    summ = result.summary()
    ess = summ["ess"].to_numpy()
    min_ess_per_hr = round(float(np.min(ess) * 3600.0 / wall_s), 1)
    _RESULT["ess_per_hr"] = min_ess_per_hr
    _RESULT["ess_per_hr_full_block"] = min_ess_per_hr
    _RESULT["ess_detail"] = {
        "chains": num_chains,
        "draws": f"{num_warmup}+{num_samples}",
        "params": len(SW_ESTIMATED_FULL),
        "block": "full (exog + habit/csigma/Taylor rule), dense mass",
        "min_ess": round(float(np.min(ess)), 1),
        "sampling_wall_s": round(wall_s, 1),
        "compile_and_first_run_s": round(compile_and_first, 1),
        "total_ess_per_hr": round(float(np.sum(ess) * 3600.0 / wall_s), 1),
        "max_r_hat": round(float(np.max(summ["r_hat"].to_numpy())), 3),
        "diverging_frac": round(float(np.mean(result.diverging)), 4),
    }
    _emit()                      # convergence artifact is safe on stdout

    # ---- warm first fit in a fresh process against the populated cache
    if _remaining() > 60:
        try:
            out = subprocess.run(
                [sys.executable, "-c", _WARM_CHILD, cache_dir, "1"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True,
                timeout=max(60, min(_remaining() - 30,
                                    compile_and_first + wall_s)))
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("WARM_FIRST_FIT_S")]
            if out.returncode == 0 and line:
                parts = line[-1].split()
                warm_s = float(parts[1])
                warm_build = float(parts[2])
                warm_fit = float(parts[3])
                det = _RESULT["ess_detail"]
                det["first_fit_cold_s"] = round(compile_and_first, 1)
                det["first_fit_warm_s"] = warm_s
                det["warm_cache_hits"] = int(parts[4])
                det["warm_speedup"] = round(compile_and_first / warm_s, 2)
                # compile-portion estimates (first fit includes a full
                # sampling pass; subtract the measured pure-sampling wall)
                det["compile_cold_est_s"] = round(
                    max(0.0, compile_and_first - wall_s), 1)
                det["compile_warm_est_s"] = round(
                    max(0.0, warm_fit - wall_s), 1)
            else:
                _RESULT.setdefault("notes", []).append(
                    f"warm-fit child rc={out.returncode}: "
                    f"{out.stderr[-300:]}")
        except subprocess.TimeoutExpired:
            _RESULT.setdefault("notes", []).append(
                "warm-fit child exceeded budget (cache likely cold "
                "through this backend)")


def main():
    profile_dir = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        profile_dir = (sys.argv[i + 1] if len(sys.argv) > i + 1
                       else "/tmp/geconpy_tpu_trace")

    try:
        platform = _probe_tunnel()
    except BaseException as e:  # noqa: BLE001 — any backend failure = skip
        _RESULT["skipped"] = f"tunnel down: {type(e).__name__}: {e}"
        _emit()
        return
    _RESULT["platform"] = platform

    stages = [("forward", lambda: _stage_forward(profile_dir), 1500),
              ("value_grad", _stage_value_grad, 1200),
              ("ess", _stage_ess, 3600)]
    for name, stage, limit in stages:
        if _remaining() < 60:
            _RESULT.setdefault("notes", []).append(
                f"{name}: skipped (budget exhausted)")
            break
        try:
            with _alarm(min(limit, max(60, _remaining()))):
                stage()
        except BaseException as e:  # noqa: BLE001 — keep earlier results
            _RESULT.setdefault("notes", []).append(
                f"{name}: {type(e).__name__}: {e}")
        _emit()


if __name__ == "__main__":
    main()
