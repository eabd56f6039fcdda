"""Probe: value+grad cost vs (kalman_settle, cr_iters) on SW-2007 batch 512.

Accuracy reference: the settle=64, cr_iters=22 configuration (well past
convergence).  Reports us/draw + max rel error of logpost and grad vs ref.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import geconpy_tpu
from geconpy_tpu.stats.statespace import DSGEStateSpace

estimated = ["crhoa", "crhob", "crhog", "crhoqs", "crhoms", "crhopinf",
             "crhow", "cmap", "cmaw", "cgy", "sigma_ea", "sigma_eb",
             "sigma_eg", "sigma_eqs", "sigma_em", "sigma_epinf",
             "sigma_ew", "crpi", "crr", "cry", "chabb", "csigma"]
model = geconpy_tpu.model_from_gcn(
    geconpy_tpu.get_example_gcn("sw2007"), verbose=False)
constant = [p for p in model.param_names if p not in estimated]

batch_size = 512


def build(settle, cr_iters):
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["y", "c", "inve", "w", "pinf", "r", "lab"],
                 filter_type="stationary", kalman_settle=settle,
                 constant_params=constant)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
    u0 = ss.unconstrain(draw).astype(jnp.float32)
    batch = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (batch_size, u0.shape[0]), dtype=jnp.float32)
    data32 = np.asarray(data, dtype=np.float32)
    vag = jax.jit(ss.build_batched_logpost_and_grad(data32,
                                                    cr_iters=cr_iters))
    return vag, batch


def run(settle, cr_iters, ref=None):
    vag, batch = build(settle, cr_iters)
    t0 = time.perf_counter()
    vals, grads = jax.block_until_ready(vag(batch))
    compile_s = time.perf_counter() - t0
    n_reps = 10
    t0 = time.perf_counter()
    for _ in range(n_reps):
        vals, grads = vag(batch)
    jax.block_until_ready((vals, grads))
    us = (time.perf_counter() - t0) / (n_reps * batch_size) * 1e6
    vals_np, grads_np = np.asarray(vals), np.asarray(grads)
    out = {"settle": settle, "cr_iters": cr_iters,
           "us_per_draw": round(us, 2),
           "finite": int(np.isfinite(vals_np).sum()),
           "compile_s": round(compile_s, 1)}
    if ref is not None:
        rvals, rgrads = ref
        both = np.isfinite(rvals) & np.isfinite(vals_np)
        out["val_rel"] = float(np.max(
            np.abs(vals_np - rvals)[both] / (1 + np.abs(rvals[both]))))
        gb = both[:, None] & np.isfinite(rgrads) & np.isfinite(grads_np)
        scale = 1 + np.abs(rgrads)
        out["grad_rel"] = float(np.max(
            (np.abs(grads_np - rgrads) / scale)[gb]))
    print(json.dumps(out), flush=True)
    return vals_np, grads_np


configs = [(64, 22), (32, 18), (24, 18), (32, 14), (24, 14), (20, 12)]
ref = None
for settle, cr in configs:
    res = run(settle, cr, ref)
    if ref is None:
        ref = res
