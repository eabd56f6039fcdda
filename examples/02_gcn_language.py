"""The GCN model language: blocks, tags, calibration, priors, special blocks.

Tour of the model-definition language (reference grammar:
``gEconpy/parser/grammar``; our front end: ``geconpy_tpu/lang``), written as
an inline GCN source so every feature is visible in one place.

Run:  python examples/02_gcn_language.py
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

GCN = """
options
{
    output logfile = FALSE;
};

tryreduce
{
    U[];
};

assumptions
{
    positive
    {
        C[], K[], L[], Y[], w[], r[];
    };
};

block HOUSEHOLD
{
    definitions
    {
        u[] = C[] ^ (1 - sigma_C) / (1 - sigma_C) -
              L[] ^ (1 + sigma_L) / (1 + sigma_L);
    };
    controls
    {
        C[], L[], K[];
    };
    objective
    {
        U[] = u[] + beta * E[][U[1]];
    };
    constraints
    {
        C[] + K[] - (1 - delta) * K[-1] = w[] * L[] + r[] * K[-1] : lambda[];
    };
    calibration
    {
        beta = 0.99;
        delta = 0.025;
        sigma_C ~ Normal(mu=1.5, sigma=0.25) = 1.5;
        sigma_L ~ Normal(mu=2.0, sigma=0.5) = 2.0;
    };
};

block FIRM
{
    controls
    {
        K[-1], L[];
    };
    objective
    {
        TC[] = -(w[] * L[] + r[] * K[-1]);
    };
    constraints
    {
        Y[] = A[] * K[-1] ^ alpha * L[] ^ (1 - alpha) : mc[];
    };
    identities
    {
        # perfect competition: zero profit
        mc[] = 1;
    };
    calibration
    {
        # calibrate alpha so labour income is 64% of output at steady state
        w[ss] * L[ss] / Y[ss] = 0.64 -> alpha;
    };
};

block TECHNOLOGY
{
    identities
    {
        log(A[]) = rho_A * log(A[-1]) + epsilon_A[];
    };
    shocks
    {
        epsilon_A[] ~ Normal(mu=0, sigma=sigma_A);
    };
    calibration
    {
        rho_A ~ Beta(alpha=3, beta=1) = 0.95;
        sigma_A ~ InverseGamma(alpha=4, beta=0.03) = 0.01;
    };
};
"""


def main(fast: bool = False):
    # ---- Parse only: AST + validation (no numerics).
    ast = gt.parse_gcn(GCN)
    print(f"blocks: {[b.name for b in ast.blocks]}")

    # Round-trip printing — the AST regenerates valid GCN source.
    printed = gt.print_model(ast)
    assert "HOUSEHOLD" in printed

    # ---- Load: FOC derivation, multiplier elimination, simplification.
    prims = gt.load_gcn(GCN)
    print(f"\nafter FOC derivation + tryreduce: {len(prims.equations)} "
          f"equations, {len(prims.variables)} variables")
    print(f"calibrated parameter (from the -> equation): "
          f"{[p.name for p in prims.calib_dict]}")
    print(f"priors on: {sorted(prims.priors)}")
    print(f"shock priors: {sorted(prims.shock_priors)}")

    # ---- Full build and solve.
    model = gt.model_from_gcn(GCN, verbose=False)
    ss = model.steady_state(verbose=False)
    assert ss.success
    # the calibration target holds at the solved steady state
    labour_share = (ss["w_ss"] * ss["L_ss"]) / ss["Y_ss"]
    print(f"\nlabour share at SS: {labour_share:.4f} (target 0.64)")
    print(f"solved alpha: {ss['alpha']:.4f}")

    sol = model.solve_model(verbose=False)
    print(f"\npolicy solved: {sol.success}")
    return model


if __name__ == "__main__":
    main()
