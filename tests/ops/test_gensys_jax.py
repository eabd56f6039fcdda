"""Device gensys (disk-split) vs the scipy-ordqz oracle and cycle reduction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.models.timing import structural_incidence
from geconpy_tpu.ops.gensys_jax import make_gensys_solver
from geconpy_tpu.ops.gensys_np import solve_policy_gensys
from geconpy_tpu.ops.qz_disk import disk_function_split


def test_disk_split_matches_ordqz_subspace():
    """The disk iteration's stable deflating subspace must equal scipy's
    ordered-QZ Z-block."""
    from scipy.linalg import ordqz

    rng = np.random.default_rng(0)
    n = 8
    # build a pencil with known split: eigenvalues half inside, half outside
    lam = np.concatenate([rng.uniform(0.2, 0.8, 4), rng.uniform(1.3, 3.0, 4)])
    X = rng.normal(size=(n, n))
    A = X @ np.diag(lam) @ np.linalg.inv(X)
    B = np.eye(n)
    # pencil (A, B): eigenvalues lam
    res = disk_function_split(jnp.asarray(A), jnp.asarray(B), k_stable=4)
    assert bool(res.converged), np.asarray(res.sv)
    assert int(res.n_inside) == 4

    _, _, _, _, _, Z = ordqz(A, B, sort=lambda a, b: np.abs(a / b) < 1.0,
                             output="complex")
    Z1 = np.real(Z[:, :4])  # right deflating subspace (real pencil case)
    V = np.asarray(res.V_stable)
    # same subspace: projector distance ~ 0
    P1 = Z1 @ np.linalg.pinv(Z1)
    P2 = V @ V.T
    assert np.abs(P1 - P2).max() < 1e-8


def _solve_both(model):
    mats = model.linearize_model()
    A, B, C, D = (mats[k].to_numpy() for k in "ABCD")
    inc = structural_incidence(model.primitives.equations,
                               model.functions.variables)
    lead_idx = np.flatnonzero(inc["lead"].any(axis=0))
    solver = make_gensys_solver(model.n_variables, lead_idx, D.shape[1])
    dev = solver(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                 jnp.asarray(D))
    T_np, R_np, eu = solve_policy_gensys(A, B, C, D)
    return dev, T_np, R_np, eu


# every bundled forward-looking model, including the flagship SW-2007
# (33 vars) and nk_sw — backward-looking models (baxter_king) have no
# expectational block and use the direct solver instead
FORWARD_MODELS = ["rbc", "rbc_ces", "rbc_estimation", "rbc_no_ss",
                  "rbc_two_agent", "open_rbc", "nk_3eq", "nk_full",
                  "nk_sw", "sw2007"]


@pytest.mark.parametrize("model_name", FORWARD_MODELS)
def test_device_gensys_matches_oracle(model_name):
    model = model_from_gcn(get_example_gcn(model_name), verbose=False)
    dev, T_np, R_np, eu = _solve_both(model)
    assert eu == (1, 1)
    assert bool(dev.success), (np.asarray(dev.split_dim), dev)
    np.testing.assert_allclose(np.asarray(dev.T), T_np, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dev.R), R_np, atol=1e-8)


def test_device_gensys_detects_indeterminacy():
    model = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    mats = model.linearize_model(phi_pi=0.5, phi_x=0.0)
    A, B, C, D = (mats[k].to_numpy() for k in "ABCD")
    inc = structural_incidence(model.primitives.equations,
                               model.functions.variables)
    lead_idx = np.flatnonzero(inc["lead"].any(axis=0))
    solver = make_gensys_solver(model.n_variables, lead_idx, D.shape[1])
    dev = solver(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                 jnp.asarray(D))
    assert not bool(dev.success)


def test_device_gensys_vmap():
    """Batched gensys over parameter draws — the estimation use case."""
    model = model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)
    inc = structural_incidence(model.primitives.equations,
                               model.functions.variables)
    lead_idx = np.flatnonzero(inc["lead"].any(axis=0))
    solver = make_gensys_solver(model.n_variables, lead_idx, model.n_shocks)
    linearize = model.linearizer()

    def per_draw(theta):
        sol = model.ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        return solver(lin.A, lin.B, lin.C, lin.D)

    theta0 = model.default_theta()
    # vary phi_pi across draws; include one indeterminate draw
    phis = jnp.array([1.5, 2.0, 1.1, 0.5])
    idx = model.param_names.index("phi_pi")
    thetas = jnp.tile(theta0[None, :], (4, 1)).at[:, idx].set(phis)
    out = jax.jit(jax.vmap(per_draw))(thetas)
    assert bool(jnp.all(out.success[:3]))
    assert not bool(out.success[3])
