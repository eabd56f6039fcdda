"""Deliberately-broken models: the failure machinery must attribute and flag,
never crash (mirrors the reference's error_gcns / pert_fails fixtures)."""

import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.lang.errors import GCNErrorCollection, GCNSemanticError, GCNSyntaxError


PERT_FAILS = """
block B
{
    identities
    {
        # two unstable forward roots but only one forward variable's worth of
        # expectational freedom -> BK violation (indeterminacy)
        x[] = 2.0 * x[1] + eps_x[];
        y[] = 1.5 * y[1] + 0.1 * x[] + eps_y[];
    };
    shocks { eps_x[]; eps_y[]; };
};
"""


def test_bk_violating_model_flags():
    m = model_from_gcn(PERT_FAILS, verbose=False)
    sol = m.solve_model(solver="gensys", on_failure="ignore", verbose=False)
    assert not sol.success
    bk = m.check_bk_condition(verbose=False)
    assert not bk.attrs["bk_satisfied"]

    with pytest.raises(RuntimeError):
        m.solve_model(solver="gensys", on_failure="error", verbose=False)


def test_nonsquare_system_raises():
    src = """
    block B
    {
        identities { x[] = 0.5 * x[-1] + y[] + eps[]; };
        shocks { eps[]; };
    };
    """
    with pytest.raises(GCNSemanticError, match="square"):
        model_from_gcn(src, verbose=False)


def test_multiple_semantic_errors_collected():
    src = """
    block B
    {
        controls { notinproblem[]; };
        objective { U[] = log(C[]); };
        constraints { C[] = w[]; };
        shocks { badshock[-1]; };
    };
    """
    with pytest.raises((GCNErrorCollection, GCNSemanticError)) as err:
        model_from_gcn(src, verbose=False)
    text = str(err.value)
    assert "E105" in text or "E110" in text


def test_steady_state_failure_is_flagged_not_raised():
    """A model whose SS solver cannot converge fails with flags."""
    src = """
    assumptions { positive { x[]; }; };
    block B
    {
        identities { log(x[]) + x[] = -50 + 0.5 * x[-1] + eps[]; };
        shocks { eps[]; };
    };
    """
    m = model_from_gcn(src, verbose=False)
    ss = m.steady_state(verbose=False)
    # either solves (tiny x) or flags failure; never raises
    assert isinstance(ss.success, bool)


def test_unterminated_block_error_location():
    src = "block B\n{\n    identities { x[] = 1; };\n"
    with pytest.raises(GCNSyntaxError) as err:
        model_from_gcn(src, verbose=False)
    assert err.value.code == "E002"


def test_solve_unsolvable_draw_in_batch():
    """vmapped pipeline over a batch with one catastrophic draw: flags only."""
    import jax
    import jax.numpy as jnp

    from geconpy_tpu import get_example_gcn
    from geconpy_tpu.ops.cycle_reduction import solve_policy_cycle_reduction

    m = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    linearize = m.linearizer()
    gensys = m.gensys_solver

    def per_draw(theta):
        sol = m.ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        # cycle reduction converges to the minimal solvent even under
        # indeterminacy (it is stable, just not unique) — uniqueness
        # detection is the gensys split's job, as in the reference
        _, _, cr_ok, *_ = solve_policy_cycle_reduction(lin.A, lin.B, lin.C,
                                                       lin.D)
        g = gensys(lin.A, lin.B, lin.C, lin.D)
        return cr_ok, g.success

    theta0 = m.default_theta()
    idx = m.param_names.index("phi_pi")
    thetas = jnp.stack([theta0, theta0.at[idx].set(0.2),  # passive policy
                        theta0.at[idx].set(jnp.nan)])      # poisoned draw
    cr_ok, gs_ok = jax.jit(jax.vmap(per_draw))(thetas)
    assert bool(cr_ok[0]) and bool(gs_ok[0])
    assert not bool(gs_ok[1])       # indeterminacy flagged by gensys
    assert not bool(cr_ok[2])       # NaN draw flagged by both
    assert not bool(gs_ok[2])
