"""Bayesian estimation: state space, priors, NUTS, posterior analysis.

TPU-native counterpart of the reference's estimation user guide
(``docs/source/user_guide/estimation.rst``).  The reference hands its
PyTensor statespace to PyMC; here the whole chain — prior transform,
steady state, perturbation solve, Kalman likelihood, NUTS — is one jitted
JAX program, so thousands of chains vmap/shard over a TPU mesh.

Run:  python examples/05_estimation.py          (a few minutes on CPU)
      python examples/05_estimation.py --fast   (smoke settings)
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

import geconpy_tpu as gt
from geconpy_tpu.stats.statespace import DSGEStateSpace


def main(fast: bool = False):
    # ---- 1. Model + state space.  rbc_estimation declares priors with `~`
    # in its calibration blocks; parameters without priors stay constant.
    model = gt.model_from_gcn(gt.get_example_gcn("rbc_estimation"),
                              verbose=False)
    ss_mod = DSGEStateSpace(model)
    ss_mod.configure(
        observed_states=["Y", "C"],
        measurement_error=["Y", "C"],       # estimated ME std per series
        filter_type="stationary",           # constant-gain DARE filter:
                                            # the fast NUTS configuration
    )
    print("estimated parameters:", ss_mod.param_labels)

    # ---- 2. Synthetic data from one prior draw (ground truth known).
    data, true_draw = ss_mod.data_from_prior(jax.random.PRNGKey(7),
                                             periods=120 if fast else 200)
    print("data shape:", data.shape)

    # ---- 3. NUTS.  Chains are vmapped; warmup adapts a diagonal mass
    # matrix seeded from the MAP curvature (init="map", mass_init="auto").
    result = gt.fit(
        ss_mod, data,
        num_chains=2,
        num_warmup=40 if fast else 300,
        num_samples=40 if fast else 300,
        seed=0,
        init="map" if not fast else "prior",
    )

    # ---- 4. Convergence + recovery: R-hat, ESS, true values in the HDI.
    summ = result.summary()
    print("\nposterior summary:")
    print(summ.round(3))
    for name in ss_mod.param_labels:
        true_val = float(true_draw[name]) if name in true_draw else None
        if true_val is not None:
            print(f"  true {name} = {true_val:.4f}")

    # ---- 5. Posterior-functional analysis: IRF bands, FEVD, smoothed
    # states, historical decompositions all reuse the posterior draws.
    from geconpy_tpu.stats.posterior import posterior_fevd, posterior_irfs

    irfs = posterior_irfs(ss_mod, result, periods=10 if fast else 40,
                          max_draws=25)
    print("\nposterior IRF draws:", irfs.index.names, irfs.shape)
    fevd = posterior_fevd(ss_mod, result, max_draws=25)
    print("FEVD (posterior-mean variance shares, variables x shocks):")
    print(fevd.round(3))

    # ---- 6. Model comparison: marginal data density (Laplace at the MAP,
    # or Geweke's modified harmonic mean over the posterior draws).
    from geconpy_tpu.stats.model_comparison import marginal_likelihood

    logml = marginal_likelihood(ss_mod, data, result=result,
                                method="laplace")
    print(f"\nlog marginal likelihood (Laplace): {float(logml):.2f}")

    # ---- 7. Gradient-free alternative: likelihood-tempered SMC.  The
    # inner loop is the batched sweep kernel (Pallas on TPU), every stage
    # is a bounded device call, and the evidence comes out for free.
    if not fast:
        smc = gt.fit_smc(ss_mod, data, n_particles=512, n_mh=2,
                         interpret=True)
        print(f"SMC: {len(smc.phi_schedule)} tempering stages, "
              f"log evidence {smc.log_evidence:.2f} "
              f"(Laplace said {float(logml):.2f})")

    # ---- 8. Out-of-sample: fan-chart forecast and a conditional
    # "what if Y follows this path" scenario (Waggoner-Zha).
    fc = gt.posterior_forecast(ss_mod, result, data, horizon=12,
                               max_draws=50)
    print("\nforecast fan (tail):")
    print(fc.tail(3).round(4))

    # ---- 9. Figures (rendered into docs/examples/ by docs/gen_examples.py):
    # posterior IRF bands and the forecast fan chart.
    from geconpy_tpu.analysis.plotting import plot_forecast, plot_irf

    plot_irf(irfs, variables=["Y", "C"])
    plot_forecast(fc, data=data, observed_names=["Y", "C"])
    return result


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
