"""GCN language semantics at the MODEL level: source-to-solution
equivalences that the grammar/AST tests cannot see (two different GCN
sources that must produce the same economics).

Each test builds tiny models both ways and compares steady states and
policy matrices — the reference pins these semantics through its
transform-layer tests; here the contract is end-to-end.
"""

import numpy as np
import pytest

from geconpy_tpu import model_from_gcn

AR_CORE = """
    identities
    {{
        x[] = rho * x[-1] + {drive};
        y[] = a * x[] + b * y[-1];
    }};
    shocks {{ eps[]; }};
    calibration {{ rho = 0.7; a = 0.5; b = 0.4; }};
"""


def _solve(src):
    m = model_from_gcn(src, verbose=False)
    sol = m.solve_model(verbose=False)
    assert sol.success
    return m, sol


def _block(body):
    return "block B\n{\n" + body + "\n};\n"


def test_comments_and_whitespace_are_semantically_inert():
    src_plain = _block(AR_CORE.format(drive="eps[]"))
    src_noisy = ("# leading comment\n"
                 + src_plain.replace("x[] =", "x[]   =  # inline\n        ")
                 .replace(";\n", ";\n\n"))
    _, sol_a = _solve(src_plain)
    _, sol_b = _solve(src_noisy)
    np.testing.assert_allclose(sol_a.T.to_numpy(), sol_b.T.to_numpy(),
                               atol=1e-14)
    np.testing.assert_allclose(sol_a.R.to_numpy(), sol_b.R.to_numpy(),
                               atol=1e-14)


def test_expectation_wrapper_is_identity_on_leads():
    """E[][expr(t+1)] and the bare lead must produce the same pencil —
    perturbation treats every t+1 term as an expectation."""
    base = """
    identities
    {
        x[] = 0.5 * %s + eps[];
    };
    shocks { eps[]; };
    """
    _, sol_a = _solve(_block(base % "E[][x[1]]"))
    _, sol_b = _solve(_block(base % "x[1]"))
    np.testing.assert_allclose(sol_a.T.to_numpy(), sol_b.T.to_numpy(),
                               atol=1e-14)


def test_definitions_inline_equivalence():
    """A `definitions` entry must behave exactly like writing the expression
    inline at its use sites."""
    with_def = """
block HH
{
    definitions { u[] = log(C[]); };
    controls { C[], K[]; };
    objective { U[] = u[] + beta * E[][U[1]]; };
    constraints { C[] + K[] = A[] * K[-1] ^ alpha : lam[]; };
    calibration { beta = 0.96; };
};
block TECH
{
    identities { log(A[]) = rho * log(A[-1]) + eps[]; };
    shocks { eps[]; };
    calibration { alpha = 0.33; rho = 0.9; };
};
"""
    inline = with_def.replace("    definitions { u[] = log(C[]); };\n", "") \
        .replace("U[] = u[] +", "U[] = log(C[]) +")
    _, sol_a = _solve(with_def)
    _, sol_b = _solve(inline)
    ta = sol_a.T.loc[["A", "C", "K"], ["A", "C", "K"]].to_numpy()
    tb = sol_b.T.loc[["A", "C", "K"], ["A", "C", "K"]].to_numpy()
    np.testing.assert_allclose(ta, tb, atol=1e-10)


def test_block_order_is_irrelevant():
    two_blocks = """
block ONE
{
    identities { x[] = rho * x[-1] + eps[]; };
    shocks { eps[]; };
    calibration { rho = 0.7; };
};
block TWO
{
    identities { y[] = a * x[] + b * y[-1]; };
    calibration { a = 0.5; b = 0.4; };
};
"""
    reversed_src = two_blocks.split("block TWO")[0], \
        "block TWO" + two_blocks.split("block TWO")[1]
    swapped = reversed_src[1] + reversed_src[0]
    _, sol_a = _solve(two_blocks)
    _, sol_b = _solve(swapped)
    order = ["x", "y"]
    np.testing.assert_allclose(
        sol_a.T.loc[order, order].to_numpy(),
        sol_b.T.loc[order, order].to_numpy(), atol=1e-14)


def test_deterministic_parameter_resolves_through_free_parameter():
    """`b = 2 * a` declared in calibration keeps tracking `a` through
    parameter updates at solve time."""
    src = _block("""
    identities
    {
        x[] = rho * x[-1] + eps[];
        y[] = b * x[] ;
    };
    shocks { eps[]; };
    calibration { rho = 0.6; b = 2 * a; a = 0.2; };
""")
    m = model_from_gcn(src, verbose=False)
    sol1 = m.solve_model(verbose=False)
    sol2 = m.solve_model(verbose=False, a=0.4)
    iy, ix = (list(sol1.T.index).index("y"), list(sol1.T.index).index("x"))
    # y = b x: impact of eps on y is b * impact on x
    r1 = sol1.R.to_numpy()
    r2 = sol2.R.to_numpy()
    np.testing.assert_allclose(r1[iy, 0] / r1[ix, 0], 0.4, atol=1e-10)
    np.testing.assert_allclose(r2[iy, 0] / r2[ix, 0], 0.8, atol=1e-10)


def test_explicit_multiplier_name_matches_auto_generated():
    """Naming the constraint multiplier (`: lam[]`) must not change the
    planner solution relative to the auto-generated multiplier."""
    named = """
block PLANNER
{
    controls { C[], K[]; };
    objective { U[] = log(C[]) + beta * E[][U[1]]; };
    constraints { C[] + K[] = A[] * K[-1] ^ alpha : lam[]; };
    calibration { beta = 0.96; };
};
block TECH
{
    identities { log(A[]) = rho * log(A[-1]) + eps[]; };
    shocks { eps[]; };
    calibration { alpha = 0.33; rho = 0.9; };
};
"""
    anonymous = named.replace(" : lam[]", "")
    _, sol_a = _solve(named)
    _, sol_b = _solve(anonymous)
    shared = ["A", "C", "K"]
    np.testing.assert_allclose(
        sol_a.T.loc[shared, shared].to_numpy(),
        sol_b.T.loc[shared, shared].to_numpy(), atol=1e-10)


def test_deep_lag_equals_manual_auxiliary_chain():
    """x[-3] must solve identically to the hand-written first-order chain."""
    deep = _block("""
    identities { x[] = 0.2 * x[-3] + eps[]; };
    shocks { eps[]; };
""")
    manual = _block("""
    identities
    {
        x[] = 0.2 * x_l2[-1] + eps[];
        x_l1[] = x[-1];
        x_l2[] = x_l1[-1];
    };
    shocks { eps[]; };
""")
    m_a, sol_a = _solve(deep)
    m_b, sol_b = _solve(manual)
    # compare the IRF of x itself (aux naming differs)
    from geconpy_tpu import impulse_response_function

    irf_a = impulse_response_function(sol_a, periods=10, shock_size=0.01)
    irf_b = impulse_response_function(sol_b, periods=10, shock_size=0.01)
    np.testing.assert_allclose(irf_a.loc["eps"]["x"].to_numpy(),
                               irf_b.loc["eps"]["x"].to_numpy(), atol=1e-12)


def test_deep_lead_equals_manual_auxiliary_chain():
    deep = _block("""
    identities { x[] = 0.4 * E[][x[2]] + 0.3 * x[-1] + eps[]; };
    shocks { eps[]; };
""")
    manual = _block("""
    identities
    {
        x[] = 0.4 * E[][x_f1[1]] + 0.3 * x[-1] + eps[];
        x_f1[] = E[][x[1]];
    };
    shocks { eps[]; };
""")
    _, sol_a = _solve(deep)
    _, sol_b = _solve(manual)
    from geconpy_tpu import impulse_response_function

    irf_a = impulse_response_function(sol_a, periods=10, shock_size=0.01)
    irf_b = impulse_response_function(sol_b, periods=10, shock_size=0.01)
    np.testing.assert_allclose(irf_a.loc["eps"]["x"].to_numpy(),
                               irf_b.loc["eps"]["x"].to_numpy(), atol=1e-10)


def test_ss_reference_tracks_parameters():
    """A Taylor-rule-style x[ss] reference must move with the parameters
    that move the steady state."""
    src = _block("""
    identities
    {
        x[] = xbar + rho * (x[-1] - x[ss]) + eps[];
    };
    shocks { eps[]; };
    calibration { xbar = 1.0; rho = 0.5; };
""")
    m = model_from_gcn(src, verbose=False)
    ss1 = m.steady_state(verbose=False).to_string()
    ss2 = m.steady_state(verbose=False, xbar=2.0).to_string()
    np.testing.assert_allclose(ss1["x_ss"], 1.0, atol=1e-9)
    np.testing.assert_allclose(ss2["x_ss"], 2.0, atol=1e-9)


def test_tryreduce_preserves_remaining_dynamics():
    """tryreduce-ing an auxiliary variable must leave the surviving
    variables' law of motion untouched."""
    with_aux = """
tryreduce { z[]; };
block B
{
    identities
    {
        x[] = rho * x[-1] + eps[];
        z[] = 2 * x[];
    };
    shocks { eps[]; };
    calibration { rho = 0.7; };
};
"""
    without = _block("""
    identities { x[] = rho * x[-1] + eps[]; };
    shocks { eps[]; };
    calibration { rho = 0.7; };
""")
    m_a, sol_a = _solve(with_aux)
    _, sol_b = _solve(without)
    assert "z" not in sol_a.T.index          # eliminated
    np.testing.assert_allclose(
        sol_a.T.loc["x", "x"], sol_b.T.loc["x", "x"], atol=1e-14)


def test_shock_scaling_is_linear_in_equation():
    """`sigma * eps[]` in the equation scales the impact column exactly."""
    unscaled = _block(AR_CORE.format(drive="eps[]"))
    scaled = _block(AR_CORE.format(drive="sigma * eps[]")).replace(
        "calibration { rho", "calibration { sigma = 0.25; rho")
    _, sol_a = _solve(unscaled)
    _, sol_b = _solve(scaled)
    np.testing.assert_allclose(sol_b.R.to_numpy(), 0.25 * sol_a.R.to_numpy(),
                               atol=1e-12)
    np.testing.assert_allclose(sol_b.T.to_numpy(), sol_a.T.to_numpy(),
                               atol=1e-12)


def test_duplicate_variable_across_blocks_is_shared_not_redeclared():
    """Using x[] in two blocks refers to ONE variable (cross-block linkage),
    not a name clash."""
    src = """
block SUPPLY
{
    identities { x[] = rho * x[-1] + eps[]; };
    shocks { eps[]; };
    calibration { rho = 0.7; };
};
block DEMAND
{
    identities { y[] = 0.5 * x[] + 0.3 * y[-1]; };
};
"""
    m, sol = _solve(src)
    assert sorted(v for v in sol.T.index) == ["x", "y"]
    np.testing.assert_allclose(sol.T.loc["x", "x"], 0.7, atol=1e-12)
