"""Second-order perturbation: pruned simulation, GIRFs, nonlinear filters.

Beyond the reference (gEconpy is first-order only): Schmitt-Grohe/Uribe
second-order policy functions with Kim-Kim-Schaumburg pruning, asymmetric
and state-dependent (Koop-Pesaran-Potter generalized) impulse responses,
closed-form second-order means, and likelihood-based estimation of the
quadratic system through unscented / particle filters.

Run:  python examples/07_second_order.py
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
import jax.numpy as jnp
import numpy as np

import geconpy_tpu as gt


def main(fast: bool = False):
    sigma = 0.02
    model = gt.model_from_gcn(gt.get_example_gcn("rbc"), verbose=False)

    # ---- 1. Second-order solve: g_xx (state curvature), g_uu, g_xu and
    # the uncertainty correction g_ss, via nested jacfwd Hessians and a
    # Smith-doubling generalized Sylvester (no Schur, no kron).
    sol, res2 = model.solve_model_second_order(shock_std=sigma)
    print(f"second order: success={bool(res2.success)}  "
          f"|g_xx|={float(jnp.max(jnp.abs(res2.G_xx))):.4f}  "
          f"|g_ss|={float(jnp.max(jnp.abs(res2.g_ss))):.4f}")

    # ---- 2. Pruned simulation and asymmetric IRFs.  At second order,
    # positive and negative shocks no longer mirror each other.
    periods = 12 if fast else 40
    from geconpy_tpu.analysis import (impulse_response_second_order,
                                      simulate_second_order)

    sims = simulate_second_order(sol, res2, periods=periods,
                                 n_simulations=5, shock_std=sigma, seed=0)
    print(f"pruned simulations: {sims.shape}")

    irf_pos = impulse_response_second_order(sol, res2, periods=periods,
                                            shock_size=+0.05)
    irf_neg = impulse_response_second_order(sol, res2, periods=periods,
                                            shock_size=-0.05)
    asym = (irf_pos.loc[(model.shocks[0],)]["C"]
            + irf_neg.loc[(model.shocks[0],)]["C"])
    print(f"IRF asymmetry in C (pos + neg, impact): {float(asym.iloc[0]):+.6f}")

    # ---- 3. Uncertainty shifts the stochastic steady state: closed-form
    # unconditional second-order mean (no simulation needed).
    from geconpy_tpu.models.second_order import second_order_mean

    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    Q = jnp.array([[sigma ** 2]])
    mean2 = np.asarray(second_order_mean(T, R, res2, Q))
    names = list(sol.T.columns)
    iK = names.index("K")
    print(f"second-order mean shift of K (log dev from det. SS): "
          f"{mean2[iK]:+.6f}")

    # ---- 4. Generalized IRFs: state-dependent responses, averaged over
    # the shock distribution (Koop-Pesaran-Potter).
    from geconpy_tpu.models.second_order import generalized_irf

    girf = generalized_irf(T, R, res2, jnp.array([0.05]), Q,
                           periods=periods, n_draws=32 if fast else 256,
                           key=jax.random.PRNGKey(0))
    print(f"GIRF of K, impact: {float(girf[0, iK]):+.6f}")

    # ---- 5. Estimation at second order: the pruned state space is
    # nonlinear, so the NUTS target uses a differentiable unscented Kalman
    # filter (or a bootstrap particle filter for PMMH cross-checks).
    if not fast:
        from geconpy_tpu.stats.statespace import DSGEStateSpace

        est = gt.model_from_gcn(gt.get_example_gcn("rbc_estimation"),
                                verbose=False)
        ss_mod = DSGEStateSpace(est)
        ss_mod.configure(observed_states=["Y", "C"],
                         measurement_error={"Y": 0.003, "C": 0.003})
        data, draw = ss_mod.data_from_prior(jax.random.PRNGKey(2),
                                            periods=120)
        from geconpy_tpu.stats.nonlinear import (build_logpost_second_order,
                                                 build_pf_loglik_second_order)

        logpost2 = jax.jit(build_logpost_second_order(ss_mod, data))
        u = ss_mod.unconstrain(draw)
        print(f"\nUKF second-order logpost at truth: {float(logpost2(u)):.3f}")
        pf = build_pf_loglik_second_order(ss_mod, data, n_particles=512)
        ll_pf = float(pf(u, jax.random.PRNGKey(4)))
        print(f"particle-filter cross-check:       {ll_pf:.3f}")
        print("full NUTS at order 2: gt.fit(ss_mod, data, order=2)")
    return res2


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
