"""The estimator toolbox beyond NUTS: MLE, GMM, IRF matching, SMC,
DSGE-VAR, model comparison, forecasting.

One small model, every estimator — all sharing the same differentiable
``theta -> solution`` pipeline, so the frequentist tools run on exact
gradients (Adam + Gauss-Newton/Newton) and the Bayesian ones on batched
device sweeps.  No counterpart in the reference gEconpy (its estimation
story is PyMC/NUTS only).

Run:  python examples/11_estimator_toolbox.py  (--fast for smoke settings)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import os

if "GECONPY_PLATFORM" in os.environ:
    # Pin the JAX platform BEFORE first use (plugins may prepend themselves
    # ahead of the JAX_PLATFORMS env var): GECONPY_PLATFORM=cpu python ...
    import jax

    jax.config.update("jax_platforms", os.environ["GECONPY_PLATFORM"])

import jax
import numpy as np

import geconpy_tpu as gt
from geconpy_tpu.stats.statespace import DSGEStateSpace


def main(fast: bool = False):
    model = gt.model_from_gcn(gt.get_example_gcn("rbc_estimation"),
                              verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"],
                 constant_params=["alpha", "sigma_C"],
                 filter_type="stationary", kalman_settle=48,
                 measurement_error={"Y": 0.005, "C": 0.005})
    periods = 200 if fast else 600
    data, truth = ss.data_from_prior(
        jax.random.PRNGKey(4), periods=periods,
        params={"rho_A": 0.92, "sigma_A": 0.012})
    data = np.asarray(data)
    print(f"true rho_A = {float(truth['rho_A']):.3f}, "
          f"sigma_A = {float(truth['sigma_A']):.4f}\n")

    # ---- 1. Maximum likelihood (the Dynare default mode)
    from geconpy_tpu.stats import fit_ml

    mle = fit_ml(ss, data, adam_steps=200 if fast else 500)
    print("MLE:")
    print(mle.summary().round(4))
    print(f"AIC {mle.aic:.1f}  BIC {mle.bic:.1f}\n")

    # ---- 2. GMM on analytic moments (no simulation noise)
    from geconpy_tpu.stats import fit_moment_matching

    gmm = fit_moment_matching(ss, data, lags=(1, 2),
                              adam_steps=200 if fast else 400)
    print("GMM:", {k: round(v, 4) for k, v in gmm.params.items()},
          "SEs:", {k: round(v, 4) for k, v in gmm.std_errors.items()}, "\n")

    # ---- 3. IRF matching (minimum distance on the differentiable
    # theta -> IRF map; here the target is the model's own truth IRF)
    from geconpy_tpu.stats import build_irf_fn, fit_irf_matching
    import pandas as pd

    irf_true, _ = jax.jit(build_irf_fn(model, "epsilon_A", periods=30))(
        model.default_theta(rho_A=float(truth["rho_A"])))
    tgt = pd.DataFrame(
        {v: np.asarray(irf_true)[:, model.variables.index(v)]
         for v in ["Y", "C"]}, index=range(30))
    md = fit_irf_matching(model, {"epsilon_A": tgt}, estimated=["rho_A"],
                          x0={"rho_A": 0.8})
    print(f"IRF matching: rho_A = {md.params['rho_A']:.4f} "
          f"(loss {md.loss:.2e})\n")

    # ---- 4. SMC: tempered posterior + evidence, every stage a bounded
    # device call
    smc = gt.fit_smc(ss, data, n_particles=256 if fast else 1024,
                     n_mh=1 if fast else 2, interpret=True)
    print(f"SMC: {len(smc.phi_schedule)} stages, "
          f"log evidence {smc.log_evidence:.1f}")
    print(smc.summary().round(4), "\n")

    # ---- 5. DSGE-VAR: how much do the data want to deviate from the
    # cross-equation restrictions?
    from geconpy_tpu.stats import dsge_var_lambda_profile

    prof = dsge_var_lambda_profile(ss, data, p=2,
                                   u=ss.unconstrain(truth))
    print("DSGE-VAR lambda profile (log-ML by prior weight):")
    print(prof.round(1))
    print(f"-> preferred lambda: {prof['log_ml'].idxmax()} "
          "(large = restrictions fit)\n")

    # ---- 6. Conditional forecast: what if Y is pinned for two quarters?
    res = gt.fit(ss, data, num_chains=2, num_warmup=100 if fast else 200,
                 num_samples=100 if fast else 200, seed=1,
                 pooled_adaptation=True)
    y_end = float(data[-1, 0])
    fc, shocks = gt.conditional_forecast(
        ss, res, data, {"Y": [y_end * 1.01, y_end * 1.01]}, horizon=8,
        max_draws=50)
    print("conditional forecast (Y pinned 2 quarters):")
    print(fc.loc["C"].head(4).round(4))
    return mle


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
