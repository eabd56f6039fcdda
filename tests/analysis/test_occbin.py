"""OccBin piecewise-linear solver (analysis/occbin.py).

Toy fixture with a closed-form answer: an AR(1) "notional" process and an
observed variable floored at -0.5.  After a large negative shock the floor
binds exactly while the notional level is below it, then the path decays
geometrically from the floor — every entry is checkable by hand.
"""

import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.analysis.occbin import solve_occbin

REF_GCN = """
block DYNAMICS
{
    identities
    {
        xnot[] = rho * x[-1] + epsilon_x[];
        x[] = xnot[];
    };
    shocks { epsilon_x[]; };
    calibration { rho = 0.8; };
};
"""

# constraint binding: x is pinned at the floor; notional law unchanged
ALT_GCN = """
block DYNAMICS
{
    identities
    {
        xnot[] = rho * x[-1] + epsilon_x[];
        x[] = -0.5;
    };
    shocks { epsilon_x[]; };
    calibration { rho = 0.8; };
};
"""


@pytest.fixture(scope="module")
def regimes():
    ref = model_from_gcn(REF_GCN, verbose=False)
    # the binding regime pins x to a constant; keep it as a variable
    alt = model_from_gcn(ALT_GCN, verbose=False,
                         simplify_constants_flag=False)
    return ref, alt


def test_floor_binds_then_releases(regimes):
    ref, alt = regimes
    res = solve_occbin(
        ref, alt, bind="xnot[] < -0.5", relax="xnot[] > -0.5",
        periods=30, shocks={"epsilon_x": np.array([-2.0])})
    assert res.success
    x = res.trajectory["x"].to_numpy()
    xnot = res.trajectory["xnot"].to_numpy()
    # period 1: notional -2, so the floor binds
    assert res.regime[0] == 1
    np.testing.assert_allclose(xnot[0], -2.0, atol=1e-6)
    np.testing.assert_allclose(x[0], -0.5, atol=1e-6)
    # period 2 on: notional rho * (-0.5) = -0.4 > floor, regime released
    assert res.regime[1] == 0
    np.testing.assert_allclose(x[1], -0.4, atol=1e-6)
    # geometric decay from the release point
    np.testing.assert_allclose(x[1:6], -0.4 * 0.8 ** np.arange(5), atol=1e-6)
    assert not res.regime[1:].any()


def test_multi_period_spell(regimes):
    ref, alt = regimes
    # rho * (-0.7) = -0.56 < -0.5: the *notional feedback from the floored
    # path itself* keeps the constraint binding one extra period
    res = solve_occbin(
        ref, alt, bind="xnot[] < -0.5", relax="xnot[] > -0.5",
        periods=30, shocks={"epsilon_x": np.array([-3.0, -0.16])})
    assert res.success
    x = res.trajectory["x"].to_numpy()
    # t=1: notional -3 -> floor.  t=2: notional 0.8*(-0.5) - 0.16 = -0.56 ->
    # still floored.  t=3: 0.8*(-0.5) = -0.4 -> released.
    assert list(res.regime[:3]) == [1, 1, 0]
    np.testing.assert_allclose(x[:4], [-0.5, -0.5, -0.4, -0.32], atol=1e-6)


def test_no_shock_stays_linear(regimes):
    ref, alt = regimes
    res = solve_occbin(
        ref, alt, bind="xnot[] < -0.5", relax="xnot[] > -0.5",
        periods=10, shocks={"epsilon_x": np.array([0.3])})
    assert res.success
    assert not res.regime.any()
    x = res.trajectory["x"].to_numpy()
    np.testing.assert_allclose(x[:5], 0.3 * 0.8 ** np.arange(5), atol=1e-6)


def test_initial_state_and_param_override(regimes):
    ref, alt = regimes
    res = solve_occbin(
        ref, alt, bind="xnot[] < -0.5", relax="xnot[] > -0.5",
        periods=10, initial_state={"x": -1.0}, rho=0.6)
    assert res.success
    x = res.trajectory["x"].to_numpy()
    # notional t=1: 0.6 * (-1.0) = -0.6 -> floored; t=2: -0.3 -> free
    assert list(res.regime[:2]) == [1, 0]
    np.testing.assert_allclose(x[:3], [-0.5, -0.3, -0.18], atol=1e-6)


def test_condition_validation(regimes):
    ref, alt = regimes
    with pytest.raises(ValueError, match="must contain one of"):
        solve_occbin(ref, alt, bind="xnot[] + 1", relax="xnot[] > -0.5")
    with pytest.raises(ValueError, match="unknown symbols"):
        solve_occbin(ref, alt, bind="zzz[] < 0", relax="xnot[] > -0.5")


NK_REF = """
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
        phi_pi = 1.5; phi_x = 0.5; rho_rn = 0.7;
    };
};
"""

# ZLB regime: the policy rate is pegged at the (deviation-space) lower bound
NK_ALT = NK_REF.replace("i[] = inot[];", "i[] = -0.0101;")


def test_zlb_forward_looking():
    """ZLB spell in the 3-equation NK model: the binding regime interacts
    with expectations (C != 0), so the time-varying backward recursion is
    exercised for real.  Checks: the rate is floored while the notional
    rate is below the bound, the constrained recession is deeper than the
    unconstrained linear path, and the paths coincide once slack."""
    ref = model_from_gcn(NK_REF, verbose=False)
    alt = model_from_gcn(NK_ALT, verbose=False,
                         simplify_constants_flag=False)
    shock = {"epsilon_rn": np.array([-0.05])}
    res = solve_occbin(ref, alt, bind="inot[] < -0.0101",
                       relax="inot[] > -0.0101", periods=40, shocks=shock)
    assert res.success
    i = res.trajectory["i"].to_numpy()
    x = res.trajectory["x"].to_numpy()
    inot = res.trajectory["inot"].to_numpy()
    # the floor binds for at least one period at the start, then releases
    assert res.regime[0] == 1
    spell = int(res.regime.sum())
    assert res.regime[:spell].all() and not res.regime[spell:].any()
    np.testing.assert_allclose(i[:spell], -0.0101, atol=1e-6)
    assert (inot[:spell] < -0.0101 + 1e-9).all()
    # the rate never pierces the floor and equals the notional rate when slack
    assert (i > -0.0101 - 1e-6).all()
    np.testing.assert_allclose(i[spell:], inot[spell:], atol=1e-6)

    # unconstrained linear benchmark: same shock through the ref policy
    from geconpy_tpu.analysis.simulate import simulate_linear

    sol = ref.solve_model(loglin_variables=False)
    eps = np.zeros((40, ref.n_shocks))
    eps[0, ref.shocks.index("epsilon_rn")] = -0.05
    path = np.asarray(simulate_linear(sol.T, sol.R, eps))
    x_lin = path[:, ref.variables.index("x")]
    # ZLB makes the recession strictly deeper on impact
    assert x[0] < x_lin[0] - 1e-4
    # once the constraint is slack for good, dynamics revert (same decay)
    np.testing.assert_allclose(x[spell + 5:], x_lin[spell + 5:], rtol=0.05,
                               atol=1e-5)


def test_occbin_irf_asymmetry():
    """+/- demand shocks at the ZLB are NOT mirror images: the negative
    one hits the bound and is amplified, the positive one stays linear."""
    from geconpy_tpu.analysis.occbin import occbin_irf

    ref = model_from_gcn(NK_REF, verbose=False)
    alt = model_from_gcn(NK_ALT, verbose=False,
                         simplify_constants_flag=False)
    irf = occbin_irf(ref, alt, bind=f"inot[] < -0.0101",
                     relax=f"inot[] > -0.0101", shock="epsilon_rn",
                     sizes=(0.05, -0.05), periods=40)
    xp = irf.loc[0.05]["x"].to_numpy()
    xn = irf.loc[-0.05]["x"].to_numpy()
    # positive shock: constraint slack everywhere, pure linear response
    assert not irf.loc[0.05]["regime"].to_numpy().any()
    # negative shock: binds at the start and the recession is amplified
    assert irf.loc[-0.05]["regime"].to_numpy()[0] == 1
    assert abs(xn[0]) > abs(xp[0]) * 1.5
