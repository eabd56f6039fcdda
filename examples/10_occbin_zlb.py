"""Occasionally-binding constraints: a zero-lower-bound episode (OccBin).

Piecewise-linear solutions in the spirit of Guerrieri & Iacoviello (2015):
two regimes of the same model — the Taylor rule active vs. the policy rate
pegged at its lower bound — stitched together by a guess-and-verify loop
over the regime sequence.  No counterpart in the reference gEconpy; the
whole backward/forward recursion runs as two ``lax.scan``s inside one
``lax.while_loop`` on device.

Run:  python examples/10_occbin_zlb.py
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

# Three-equation NK model with an explicit *notional* policy rate `inot`
# (what the Taylor rule prescribes).  In the reference regime the actual
# rate follows it; in the ZLB regime the actual rate is pegged.  All
# variables are deviations from steady state, so a steady-state nominal
# rate of ~1% per quarter puts the bound at -0.0101 in deviation space.
NK = """
options { linear = TRUE; };
block STEADY_STATE {
    identities { pi[ss] = 0; x[ss] = 0; i[ss] = 0; inot[ss] = 0; rn[ss] = 0; };
};
block NK {
    identities {
        pi[] = beta * E[][pi[1]] + kappa * x[];
        x[] = E[][x[1]] - (1 / sigma) * (i[] - E[][pi[1]] - rn[]);
        inot[] = phi_pi * pi[] + phi_x * x[];
        i[] = inot[];
        rn[] = rho_rn * rn[-1] + epsilon_rn[];
    };
    shocks { epsilon_rn[]; };
    calibration {
        beta = 0.99; kappa = 0.1; sigma = 2.0;
        phi_pi = 1.5; phi_x = 0.5; rho_rn = 0.8;
    };
};
"""

I_LB = -0.0101


def main(fast: bool = False):
    ref = gt.model_from_gcn(NK, verbose=False)
    # ZLB regime: same economy, rate pegged.  Keep the pegged variable from
    # being constant-folded away.
    alt = gt.model_from_gcn(NK.replace("i[] = inot[];", f"i[] = {I_LB};"),
                            verbose=False, simplify_constants_flag=False)

    periods = 30 if fast else 60
    # a deep, persistent natural-rate drop: the notional rate goes well
    # below the bound, so the peg binds for several quarters
    res = gt.solve_occbin(
        ref, alt, bind=f"inot[] < {I_LB}", relax=f"inot[] > {I_LB}",
        periods=periods, shocks={"epsilon_rn": np.array([-0.06])})
    assert res.success, "regime fixed point not reached"

    spell = int(res.regime.sum())
    print(f"ZLB binds for {spell} quarters "
          f"(fixed point after {res.n_iter} guess-verify rounds)")

    # the linear (no-ZLB) counterfactual for comparison
    from geconpy_tpu.analysis.simulate import simulate_linear

    sol = ref.solve_model(loglin_variables=False)
    eps = np.zeros((periods, ref.n_shocks))
    eps[0, ref.shocks.index("epsilon_rn")] = -0.06
    lin = np.asarray(simulate_linear(sol.T, sol.R, eps))

    x_occ = res.trajectory["x"].to_numpy()
    x_lin = lin[:, ref.variables.index("x")]
    print(f"output gap on impact: {x_occ[0]:+.4f} with ZLB "
          f"vs {x_lin[0]:+.4f} without (deeper because the rate cannot cut)")

    i_occ = res.trajectory["i"].to_numpy()
    assert (i_occ >= I_LB - 1e-8).all()
    print("rate path (first 8):", np.round(i_occ[:8], 4))

    if True:  # figure rendered into the gallery (docs/gen_examples.py)
        try:
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 3, figsize=(12, 3.2), sharex=True)
            t = np.arange(1, periods + 1)
            for ax, name in zip(axes, ["x", "pi", "i"]):
                ax.plot(t, res.trajectory[name], label="OccBin (ZLB)")
                ax.plot(t, lin[:, ref.variables.index(name)], "--",
                        label="linear")
                ax.axvspan(1, spell + 0.5, alpha=0.12, color="red")
                ax.set_title(name)
                ax.axhline(0.0, lw=0.6, color="k")
            axes[2].axhline(I_LB, ls=":", color="red", lw=1)
            axes[0].legend(frameon=False)
            fig.tight_layout()
        except ImportError:
            pass
    return res


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
