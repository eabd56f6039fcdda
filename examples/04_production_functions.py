"""Case study: Cobb-Douglas vs CES production.

TPU-native counterpart of the reference's
``case_study/production_functions.ipynb``: the FIRM block's cost-
minimization problem is recognized structurally (CobbDouglasBlock /
CESBlock), so the factor-demand FOCs come from closed forms instead of
symbolic differentiation.  We compare the two technologies' steady states,
factor shares, and impulse responses.

Run:  python examples/04_production_functions.py
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
    # ---- 1. Cobb-Douglas: rbc.gcn's FIRM block minimizes cost subject to
    # Y = A K^alpha L^(1-alpha); the registry matches it to the specialized
    # CobbDouglasBlock and emits the closed-form demands r = alpha*Y/K etc.
    cd = gt.model_from_gcn(gt.get_example_gcn("rbc"), verbose=False)
    ss_cd = cd.steady_state(verbose=False)
    sol_cd = cd.solve_model(verbose=False)

    # ---- 2. CES: rbc_ces.gcn's production constraint is the CES
    # aggregator; the CESBlock closed form handles the general elasticity.
    ces = gt.model_from_gcn(gt.get_example_gcn("rbc_ces"), verbose=False)
    ss_ces = ces.steady_state(verbose=False)
    sol_ces = ces.solve_model(verbose=False)

    print("steady states:")
    print(f"  Cobb-Douglas: Y={float(ss_cd['Y_ss']):.4f} "
          f"K={float(ss_cd['K_ss']):.4f} L={float(ss_cd['L_ss']):.4f}")
    print(f"  CES:          Y={float(ss_ces['Y_ss']):.4f} "
          f"K={float(ss_ces['K_ss']):.4f} L={float(ss_ces['L_ss']):.4f}")

    # Factor income shares at the steady state -- constant under
    # Cobb-Douglas by construction, elasticity-dependent under CES.
    share_cd = (float(ss_cd["r_ss"]) * float(ss_cd["K_ss"])
                / float(ss_cd["Y_ss"]))
    share_ces = (float(ss_ces["r_ss"]) * float(ss_ces["K_ss"])
                 / float(ss_ces["Y_ss"]))
    print(f"\ncapital income share:  CD={share_cd:.3f}  CES={share_ces:.3f}")

    # ---- 3. Impulse responses to each model's business-cycle shock.
    periods = 10 if fast else 40
    irf_cd = gt.impulse_response_function(sol_cd, periods=periods,
                                          shock_size=0.01)
    irf_ces = gt.impulse_response_function(sol_ces, periods=periods,
                                           shock_size=0.01)
    shock_cd, shock_ces = cd.shocks[0], ces.shocks[0]
    print(f"\noutput IRF, {shock_cd} (Cobb-Douglas), first periods:")
    print(irf_cd.loc[shock_cd]["Y"].head(5).round(5))
    print(f"\noutput IRF, {shock_ces} (CES), first periods:")
    print(irf_ces.loc[shock_ces]["Y"].head(5).round(5))

    # ---- 4. Second moments: relative volatilities differ with the
    # substitution elasticity.
    sig_cd = gt.stationary_covariance_matrix(sol_cd, shock_std=0.01)
    sig_ces = gt.stationary_covariance_matrix(sol_ces, shock_std=0.01)
    import numpy as np

    def rel_sd(sig, var):
        return np.sqrt(sig.loc[var, var] / sig.loc["Y", "Y"])

    print("\nrelative std (x / Y):")
    for var in ["C", "I", "L"]:
        if var in sig_cd.index and var in sig_ces.index:
            print(f"  {var}: CD={rel_sd(sig_cd, var):.2f} "
                  f"CES={rel_sd(sig_ces, var):.2f}")
    return sol_cd, sol_ces


if __name__ == "__main__":
    main()
