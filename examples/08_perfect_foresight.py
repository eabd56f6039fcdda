"""Perfect-foresight (deterministic) transitions.

Nonlinear deterministic paths under fully-anticipated shocks, permanent
parameter changes, and time-varying parameter paths — role parity with the
reference's stacked-Newton perfect-foresight solver
(``gEconpy/model/perfect_foresight.py``), TPU-redesigned: the stacked
system's block-tridiagonal Newton direction is solved by a scan-based
block-Thomas factorization (O(T) sequential, each block a dense MXU solve).

Run:  python examples/08_perfect_foresight.py
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

import numpy as np

import geconpy_tpu as gt
from geconpy_tpu.analysis import solve_perfect_foresight


def main(fast: bool = False):
    model = gt.model_from_gcn(gt.get_example_gcn("rbc"), verbose=False)
    periods = 40 if fast else 100

    # ---- 1. An anticipated technology shock at t=5: agents see it coming
    # and adjust *before* it arrives (impossible in the linearized
    # stochastic solution).
    path = np.zeros(periods)
    path[5] = 0.05
    res = solve_perfect_foresight(model, periods=periods,
                                  shocks={model.shocks[0]: path})
    print(f"anticipated shock: success={bool(res.success)} "
          f"iters={int(res.n_iter)} resid={float(res.resid_norm):.2e}")
    traj = res.trajectory
    print("consumption around the (anticipated) impulse:")
    print(traj["C"].iloc[2:9].round(5))

    # ---- 2. A permanent parameter change: depreciation rises for good at
    # t=0; the economy transitions from the old steady state to the new one.
    res_perm = solve_perfect_foresight(
        model, periods=periods,
        initial_params={"delta": 0.025},
        terminal_params={"delta": 0.05},
    )
    print(f"\npermanent delta 0.025 -> 0.05: success={bool(res_perm.success)}")
    k = res_perm.trajectory["K"]
    print(f"K path: start {float(k.iloc[0]):.3f} -> end {float(k.iloc[-1]):.3f}")

    # ---- 3. A time-varying parameter path: a transitory tax-like wedge via
    # a declining depreciation path (any parameter accepts a full path).
    delta_path = np.full(periods, 0.025)
    delta_path[:10] = 0.04
    res_tv = solve_perfect_foresight(model, periods=periods,
                                     param_paths={"delta": delta_path})
    print(f"\ntime-varying delta: success={bool(res_tv.success)}")
    print("investment response (first periods):")
    print(res_tv.trajectory["I"].head(5).round(5))

    # figure for the gallery: temporary-shock transition paths
    from geconpy_tpu.analysis.plotting import plot_perfect_foresight

    plot_perfect_foresight(res, variables=["K", "C", "I", "Y"])
    return res


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
