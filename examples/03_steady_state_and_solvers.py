"""Steady states, calibration, and the root-solver family.

TPU-native counterpart of the reference's ``sparse_root_solvers.ipynb``:
how the steady state is found (analytic declarations, jitted Newton
variants), how calibrated parameters are solved jointly with the steady
state, and how to pin values or swap solver methods when a model is
stubborn.

Run:  python examples/03_steady_state_and_solvers.py
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

import jax.numpy as jnp

import geconpy_tpu as gt


def main(fast: bool = False):
    # ---- 1. Analytic steady state: rbc.gcn declares a steady_state block,
    # so no numeric solve happens at all.
    rbc = gt.model_from_gcn(gt.get_example_gcn("rbc"), verbose=False)
    ss = rbc.steady_state(verbose=False)
    print("rbc (analytic):", ss.success, f"resid={ss.resid_norm:.2e}")

    # ---- 2. Numeric steady state: rbc_no_ss has no steady_state block.
    # The default 'hybrid' driver runs Newton and falls back to
    # Levenberg-Marquardt; everything is jitted, failures come back as
    # flags (never exceptions), and positivity assumptions become log
    # bijectors so the solver works in unconstrained space.
    rbc_n = gt.model_from_gcn(gt.get_example_gcn("rbc_no_ss"), verbose=False)
    for method in ["hybrid", "newton", "lm", "dogleg"]:
        ss_n = rbc_n.steady_state(verbose=False, method=method)
        print(f"rbc_no_ss [{method:>7s}]: success={bool(ss_n.success)} "
              f"resid={float(ss_n.resid_norm):.2e}")

    # ---- 3. Calibrated parameters: the `target -> param` syntax makes a
    # parameter an *unknown* of the steady-state system, pinned by a
    # steady-state restriction instead of a direct value.
    calib_gcn = """
block HOUSEHOLD
{
    controls { C[], K[]; };
    objective { U[] = log(C[]) + beta * E[][U[1]]; };
    constraints
    {
        C[] + K[] = A[] * K[-1] ^ alpha + (1 - delta) * K[-1] : lambda[];
    };
    calibration
    {
        beta = 0.99;
        delta = 0.025;
        # capital-output ratio target pins alpha
        K[ss] / (A[ss] * K[ss] ^ alpha) = 10.0 -> alpha;
    };
};

block TECH
{
    identities { log(A[]) = rho * log(A[-1]) + eps_A[]; };
    shocks { eps_A[]; };
    calibration { rho = 0.9; };
};
"""
    est = gt.model_from_gcn(calib_gcn, verbose=False)
    ss_e = est.steady_state(verbose=False)
    print("\ncalibrated parameters solved with the steady state:")
    for name in est.functions.calibrated_params:
        print(f"  {name} = {float(ss_e[name]):.6f}")
    ky = float(ss_e["K_ss"]) / (float(ss_e["A_ss"])
                                * float(ss_e["K_ss"]) ** float(ss_e["alpha"]))
    print(f"  implied K/Y = {ky:.4f}  (target 10.0)")

    # ---- 4. Pinning values: fix a variable and let the solver fill in the
    # rest (role parity with the reference's fixed-values solver).  The
    # success flag validates the FULL system, so a pin that is consistent
    # with the model passes and an arbitrary one is caught — pins are
    # checked, never silently absorbed.
    L_true = float(rbc_n.steady_state(verbose=False)["L_ss"])
    good = rbc_n.steady_state(verbose=False, fixed_values={"L": L_true})
    bad = rbc_n.steady_state(verbose=False, fixed_values={"L": L_true + 0.1})
    print(f"\npinned L={L_true:.4f} (consistent):   success={bool(good.success)}")
    print(f"pinned L={L_true + 0.1:.4f} (inconsistent): "
          f"success={bool(bad.success)}  <- over-determined pin flagged")

    # ---- 5. Parameter updates flow through: steady_state(**updates)
    # re-solves under new parameter values without re-building the model.
    ss_hi = rbc.steady_state(verbose=False, delta=0.05)
    print(f"delta=0.025 -> K_ss={float(ss['K_ss']):.3f};  "
          f"delta=0.05 -> K_ss={float(ss_hi['K_ss']):.3f}")

    # ---- 6. The underlying root-solver family is public: solve any
    # square system with flag-based failure and jit/vmap safety.
    from geconpy_tpu.ops.newton import root

    def f(x):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0, x[0] - x[1]])

    for method in ["newton", "lm", "chord", "dogleg", "gauss_newton"]:
        r = root(f, jnp.array([0.9, 0.1]), method=method)
        print(f"root [{method:>12s}]: x={tuple(round(float(v), 6) for v in r.x)} "
              f"success={bool(r.success)} iters={int(r.n_iter)}")
    return ss


if __name__ == "__main__":
    main()
