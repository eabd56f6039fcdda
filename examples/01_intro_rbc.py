"""Introduction: build, solve, and analyze an RBC model.

TPU-native counterpart of the reference's introductory notebook
(``docs/source/examples/introductory/introduction_to_geconpy.ipynb``): parse
a GCN file, inspect the steady state, solve the first-order policy, and look
at IRFs, simulations, and unconditional moments.

Run:  python examples/01_intro_rbc.py
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

import geconpy_tpu as gt


def main(fast: bool = False):
    # ---- 1. Build: GCN source -> symbolic FOCs -> compiled JAX functions.
    model = gt.model_from_gcn(gt.get_example_gcn("rbc"), verbose=not fast)
    print(f"\nvariables ({model.n_variables}): {model.variables}")
    print(f"shocks: {model.shocks}")
    print(f"parameters: {model.param_names}")

    # ---- 2. Steady state (analytic where declared, jitted Newton otherwise).
    ss = model.steady_state(verbose=False)
    print("\nsteady state:")
    print(gt.print_steady_state(ss))
    assert gt.check_steady_state(model, steady_state=ss)

    # ---- 3. First-order perturbation (cycle reduction by default).
    sol = model.solve_model(verbose=False)
    print("\npolicy matrix T (transition):")
    print(sol.T.round(3))
    print("\nimpact matrix R (shocks):")
    print(sol.R.round(3))

    # Blanchard-Kahn diagnostics
    bk = gt.check_bk_condition(model, verbose=False)
    print("\neigenvalues:")
    print(bk.round(3))

    # ---- 4. Analysis: IRFs, simulation, moments.
    periods = 10 if fast else 40
    irf = gt.impulse_response_function(sol, periods=periods, shock_size=0.01)
    print("\nIRF of technology shock (first rows):")
    print(irf.loc[model.shocks[0]].head().round(5))

    sims = gt.simulate(sol, periods=periods,
                       n_simulations=5 if fast else 100, shock_std=0.01)
    print(f"\nsimulated paths: {sims.shape}")

    sigma = gt.stationary_covariance_matrix(sol, shock_std=0.01)
    print("\nstationary covariance:")
    print(sigma.round(6))

    acf = gt.autocorrelation_matrix(sol, n_lags=3, shock_std=0.01)
    print("\nautocorrelations (lag 1):")
    print(acf.loc[1].round(3))

    # ---- 5. Figures (rendered into docs/examples/ by docs/gen_examples.py)
    from geconpy_tpu.analysis.plotting import (plot_eigenvalues, plot_irf,
                                               plot_simulation)

    plot_irf(irf, variables=["Y", "C", "I", "K", "L", "r"])
    plot_simulation(sims, variables=["Y", "C", "K"])
    plot_eigenvalues(bk)
    return sol


if __name__ == "__main__":
    main()
