"""Device-side batched Blanchard-Kahn counting (bk_condition_sweep).

The sweep counts |lambda| > 1 roots per draw with repeated disk splits
(ops/qz_disk.count_eigs_inside) — fully vmapped, no per-draw host trips —
and is validated here against the scipy-ordqz oracle draw by draw.
Reference diagnostic: gEconpy/model/perturbation.py:412,448.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import ordqz

import geconpy_tpu
from geconpy_tpu.ops.qz_disk import count_eigs_inside
from geconpy_tpu.stats.perturbation_diagnostics import (_bk_pencil,
                                                        bk_condition_sweep)


def _scipy_counts(g0, g1, radius=1.0 + 1e-6):
    """Oracle: unstable-root count of the pencil g1 x = lambda g0 x."""
    _, _, alpha, beta, _, _ = ordqz(np.asarray(g0), np.asarray(g1),
                                    output="complex")
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(np.abs(alpha) > 1e-13, beta / alpha, np.inf)
    return int(np.sum(np.abs(lam) > radius))


def test_count_eigs_inside_random_pencils():
    """Counting on random well-separated pencils matches numpy eig."""
    rng = np.random.default_rng(0)
    for trial in range(10):
        n = 6
        # eigenvalues placed away from the unit circle
        moduli = rng.choice([0.3, 0.6, 1.8, 3.0], size=n)
        lam = moduli * np.exp(0j)  # real spectrum keeps the pencil real
        X = rng.normal(size=(n, n)) + np.eye(n)
        A = X @ np.diag(lam.real) @ np.linalg.inv(X)
        B = np.eye(n)
        n_inside, ok = jax.jit(count_eigs_inside)(jnp.asarray(A),
                                                  jnp.asarray(B))
        assert bool(ok), trial
        assert int(n_inside) == int(np.sum(moduli < 1.0)), trial


def test_count_eigs_infinite_roots():
    """Singular-B directions (infinite eigenvalues) count as outside."""
    A = jnp.asarray(np.diag([0.5, 0.2, 2.0, 1.0]))
    B = jnp.asarray(np.diag([1.0, 1.0, 1.0, 0.0]))  # last root infinite
    n_inside, ok = count_eigs_inside(A, B)
    assert bool(ok)
    assert int(n_inside) == 2


@pytest.fixture(scope="module")
def nk_model():
    return geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("nk_3eq"), verbose=False)


def test_bk_sweep_matches_scipy_oracle(nk_model):
    """100-draw sweep across the Taylor-principle determinacy boundary:
    vmapped disk counts equal the scipy-ordqz counts draw by draw."""
    model = nk_model
    rng = np.random.default_rng(1)
    phi_pi = rng.uniform(0.3, 2.5, size=100)    # spans phi_pi < 1 (violation)
    df = bk_condition_sweep(model, {"phi_pi": phi_pi})

    assert df["ok"].mean() > 0.9                # boundary draws may flag
    assert df.loc[df["ok"], "bk_satisfied"].sum() > 10
    assert (~df.loc[df["ok"], "bk_satisfied"]).sum() > 10

    # draw-by-draw oracle comparison on the clean draws
    linearize = model.linearizer(True)
    lead_idx = model.lead_var_idx
    free_names = [p.name for p in model.functions.free_params]
    j = free_names.index("phi_pi")
    theta0 = np.asarray(model.default_theta())
    for i in range(len(phi_pi)):
        if not df["ok"].iloc[i]:
            continue
        theta = jnp.asarray(theta0).at[j].set(phi_pi[i])
        sol = model.ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        g0, g1 = _bk_pencil(lin.A, lin.B, lin.C, lead_idx)
        expected = _scipy_counts(g0, g1)
        assert int(df["n_unstable"].iloc[i]) == expected, (
            f"draw {i}: phi_pi={phi_pi[i]:.3f} disk={df['n_unstable'].iloc[i]}"
            f" scipy={expected}")


def test_bk_sweep_agrees_with_model_table(nk_model):
    """At calibration the sweep's counts equal Model.check_bk_condition."""
    model = nk_model
    table = model.check_bk_condition(verbose=False)
    df = bk_condition_sweep(model, {"phi_pi": np.array([1.5])})
    assert bool(df["ok"].iloc[0])
    assert int(df["n_unstable"].iloc[0]) == table.attrs["n_unstable"]
    assert int(df["n_forward"].iloc[0]) == table.attrs["n_forward"]
    assert bool(df["bk_satisfied"].iloc[0]) == table.attrs["bk_satisfied"]


def test_bk_sweep_sharded_matches_unsharded(nk_model):
    """The mesh path returns the same counts (10k-draw scale runs sharded)."""
    from geconpy_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model = nk_model
    rng = np.random.default_rng(2)
    draws = {"phi_pi": rng.uniform(0.8, 2.0, size=64)}
    base = bk_condition_sweep(model, draws)
    sharded = bk_condition_sweep(model, draws, mesh=make_mesh())
    np.testing.assert_array_equal(base["n_unstable"], sharded["n_unstable"])
    np.testing.assert_array_equal(base["bk_satisfied"],
                                  sharded["bk_satisfied"])
