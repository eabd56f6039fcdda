"""NUTS ESS/hour on the flagship SW-2007 estimation (BASELINE.json's second
tracked metric, alongside evals/s/chip).

Many lockstep chains shard the per-leapfrog solve+filter batch over the
chip, so chain count IS the batching lever: `fit(policy="pallas",
filter_type="stationary", pooled_adaptation=True)` runs the whole sampler
on the Pallas value+grad hot path.

Usage: python benchmarks/bench_ess.py [chains] [warmup] [samples]
Prints one JSON line.  Runs on the real TPU (float32).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import numpy as np


def main(num_chains: int = 256, num_warmup: int = 300,
         num_samples: int = 200):
    import geconpy_tpu
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    # the full exogenous block: AR coefficients + shock scales, identified
    # from the 7 observables (policy/preference curvature held at
    # calibration — the bench measures sampling throughput on a target that
    # CONVERGES; widen at will for experiments)
    estimated = ["crhoa", "crhob", "crhog", "crhoqs", "crhoms", "crhopinf",
                 "crhow", "sigma_ea", "sigma_eb", "sigma_eg", "sigma_eqs",
                 "sigma_em", "sigma_epinf", "sigma_ew"]
    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("sw2007"), verbose=False)
    constant = [p for p in model.param_names if p not in estimated]
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["y", "c", "inve", "w", "pinf", "r", "lab"],
                 filter_type="stationary", kalman_settle=32,
                 constant_params=constant)
    data, _ = ss.data_from_prior(jax.random.PRNGKey(0), periods=200,
                                 params={"crhopinf": 0.8, "crhow": 0.85})
    data32 = np.asarray(data, dtype=np.float32)

    def run(seed):
        return geconpy_tpu.fit(
            ss, data32, num_chains=num_chains, num_warmup=num_warmup,
            num_samples=num_samples, seed=seed, policy="pallas",
            pooled_adaptation=True, max_depth=8, init="map",
            target_accept=0.9,
            segment_size=25)  # bound each device program: the axon tunnel
            # kills the worker on very long single XLA executions

    t0 = time.perf_counter()
    # compile pass: the statespace builder cache + NUTS sampler-program
    # cache make the second run() reuse every compiled executable (same
    # logpost object + identical sampler config), so wall_s below is pure
    # sampling time — no retrace, no recompile.
    run(1)
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    result = run(0)              # identical shapes: pure sampling time
    wall_s = time.perf_counter() - t0

    summ = result.summary()
    ess = summ["ess"].to_numpy()
    r_hat = summ["r_hat"].to_numpy()
    div_frac = float(np.mean(result.diverging))
    min_ess_per_hr = float(np.min(ess) * 3600.0 / wall_s)
    total_ess_per_hr = float(np.sum(ess) * 3600.0 / wall_s)
    print(json.dumps({
        "metric": "sw2007_nuts_min_ess_per_hour_per_chip",
        "value": round(min_ess_per_hr, 1),
        "unit": "ESS/hr",
        "chains": num_chains,
        "draws": f"{num_warmup}+{num_samples}",
        "wall_s": round(wall_s, 1),
        "compile_and_first_run_s": round(compile_and_first, 1),
        "total_ess_per_hr": round(total_ess_per_hr, 1),
        "max_r_hat": round(float(np.max(r_hat)), 3),
        "diverging_frac": round(div_frac, 4),
    }))


if __name__ == "__main__":
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    main(c, w, s)
