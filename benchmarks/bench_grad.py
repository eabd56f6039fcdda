"""Value+grad throughput: XLA autodiff path vs Pallas-forward/adjoint-backward.

Usage: python benchmarks/bench_grad.py [xla|pallas] [batch]
Prints one JSON line per run.  Runs on the real TPU (float32).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main(path: str = "pallas", batch_size: int = 512,
         filter_type: str = "steady_state", settle: int = 32):
    import geconpy_tpu
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    estimated = ["crhoa", "crhob", "crhog", "crhoqs", "crhoms", "crhopinf",
                 "crhow", "cmap", "cmaw", "cgy", "sigma_ea", "sigma_eb",
                 "sigma_eg", "sigma_eqs", "sigma_em", "sigma_epinf",
                 "sigma_ew", "crpi", "crr", "cry", "chabb", "csigma"]
    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("sw2007"), verbose=False)
    constant = [p for p in model.param_names if p not in estimated]
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["y", "c", "inve", "w", "pinf", "r", "lab"],
                 filter_type=filter_type, kalman_settle=settle,
                 constant_params=constant)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
    u0 = ss.unconstrain(draw).astype(jnp.float32)
    batch = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (batch_size, u0.shape[0]), dtype=jnp.float32)
    data32 = np.asarray(data, dtype=np.float32)

    if path == "pallas":
        vag = jax.jit(ss.build_batched_logpost_and_grad(data32))
    elif path == "pallas_fwd":
        f = jax.jit(ss.build_batched_logpost(data32))

        def vag(U):
            v = f(U)
            return v, v
    elif path == "xla_fwd":
        logpost = ss.build_logpost(data32)
        f = jax.jit(jax.vmap(logpost))

        def vag(U):
            v = f(U)
            return v, v
    else:
        logpost = ss.build_logpost(data32)

        def _vag(U):
            vals, grads = jax.vmap(jax.value_and_grad(logpost))(U)
            return vals, jnp.where(jnp.isfinite(grads), grads, 0.0)

        vag = jax.jit(_vag)

    t0 = time.perf_counter()
    vals, grads = jax.block_until_ready(vag(batch))
    compile_s = time.perf_counter() - t0
    finite = int(jnp.sum(jnp.isfinite(vals)))
    n_reps = 10
    t0 = time.perf_counter()
    for _ in range(n_reps):
        vals, grads = vag(batch)
    jax.block_until_ready((vals, grads))
    dt = time.perf_counter() - t0
    us_per_draw = dt / (n_reps * batch_size) * 1e6
    print(json.dumps({
        "metric": f"sw2007_value_and_grad_{path}_{filter_type}",
        "batch": batch_size,
        "us_per_draw": round(us_per_draw, 2),
        "finite_frac": round(finite / batch_size, 4),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ft = sys.argv[3] if len(sys.argv) > 3 else "steady_state"
    st = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    main(path, bs, ft, st)
