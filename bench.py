"""Headline benchmark: DSGE solve + Kalman log-likelihood throughput.

Measures evaluations/second/chip of the full estimation hot path — steady
state -> jacfwd linearization -> cycle-reduction policy solve -> Lyapunov P0
-> 200-period Kalman filter log-likelihood — vmapped over a batch of
parameter draws (the shape of the NUTS/prior-sweep workload).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s", "vs_baseline": N}

vs_baseline is measured against the driver's north-star target of
100 microseconds per draw per chip (BASELINE.md): vs_baseline > 1 beats it.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _measure(model_name: str, configure_kwargs: dict, batch_size: int = 4096,
             periods: int = 200, n_reps: int = 20) -> float:
    import geconpy_tpu
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn(model_name), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(**configure_kwargs)

    # simulated dataset (host-side, not timed)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=periods)

    u0 = ss.unconstrain(draw).astype(jnp.float32)
    key = jax.random.PRNGKey(1)
    batch = u0[None, :] + 0.05 * jax.random.normal(
        key, (batch_size, u0.shape[0]), dtype=jnp.float32)

    # batched sweep path: vmapped steady-state/linearize + lane-batched
    # Pallas cycle reduction + Pallas Riccati settle + fused Pallas
    # constant-gain filter tail
    fn = jax.jit(ss.build_batched_loglik(
        np.asarray(data, dtype=np.float32),
        n_settle=ss.kalman_settle, policy="pallas", settle="pallas"))
    out = jax.block_until_ready(fn(batch))  # compile + sanity
    n_finite = int(jnp.sum(jnp.isfinite(out)))
    finite_frac = n_finite / batch_size
    assert finite_frac >= 0.99, \
        f"{model_name}: only {n_finite}/{batch_size} finite logposts"

    # cross-check against the reference (gradient-capable) logpost path —
    # same solve + filter through independent XLA kernels — per-draw, over
    # >= 512 draws, at a relative tolerance defensible for a float32
    # 200-period log-likelihood
    n_check = min(512, batch_size)
    logpost = ss.build_logpost(np.asarray(data, dtype=np.float32))
    ref = np.asarray(jax.jit(jax.vmap(logpost))(batch[:n_check]))
    got = np.asarray(out[:n_check])
    both = np.isfinite(ref) & np.isfinite(got)
    assert both.mean() >= 0.99, \
        f"{model_name}: paths disagree on finiteness ({both.mean():.3f})"
    rel = np.max(np.abs(got - ref)[both] / (1.0 + np.abs(ref[both])))
    assert rel < 5e-4, \
        f"{model_name}: batched path off by rel {rel:.2e} on {both.sum()} draws"

    start = time.perf_counter()
    for _ in range(n_reps):
        out = fn(batch)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return n_reps * batch_size / elapsed


def main():
    # headline: Smets-Wouters 2007 (33 variables, 7 shocks, 7 observables):
    # full per-draw pipeline — steady state -> jacfwd linearization -> cycle
    # reduction policy solve -> Lyapunov P0 -> 200-period Kalman
    # log-likelihood (constant-gain fast path after settling, the standard
    # DSGE-estimation filter).  This is BASELINE.json config 4.
    estimated = ["crhoa", "crhob", "crhog", "crhoqs", "crhoms", "crhopinf",
                 "crhow", "cmap", "cmaw", "cgy", "sigma_ea", "sigma_eb",
                 "sigma_eg", "sigma_eqs", "sigma_em", "sigma_epinf",
                 "sigma_ew", "crpi", "crr", "cry", "chabb", "csigma"]
    import geconpy_tpu

    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("sw2007"), verbose=False)
    constant = [p for p in model.param_names if p not in estimated]
    evals_per_sec = _measure(
        "sw2007",
        dict(observed_states=["y", "c", "inve", "w", "pinf", "r", "lab"],
             filter_type="steady_state", kalman_settle=32,
             constant_params=constant),
    )
    us_per_draw = 1e6 / evals_per_sec
    target_us = 100.0
    print(json.dumps({
        "metric": "sw2007_solve_kalman200_loglik_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(target_us / us_per_draw, 3),
    }))


if __name__ == "__main__":
    main()
