"""Second-order (pruned, marginalized-UKF) value+grad throughput on the
current default device.

Measures the batched NUTS-shaped workload for order-2 estimation: vmapped
``value_and_grad`` of ``build_logpost_second_order`` (RBC in levels, 200
periods, rematerialized filter scan).  Run on the real TPU chip:

    python benchmarks/bench_second_order.py

``remat=True`` is required at batch >= 512 on a 16GB chip: the stored
residuals of the 200-step filter otherwise exceed HBM (measured 17.6G).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace


def main():
    model = model_from_gcn("geconpy_tpu/data/rbc_estimation.gcn", verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"])
    data, draw = ss.data_from_prior(jax.random.PRNGKey(1), periods=200)
    u = jnp.asarray(ss.unconstrain(draw), jnp.float32)
    data = np.asarray(data, np.float32)

    vg_b = jax.jit(jax.vmap(jax.value_and_grad(
        ss.build_logpost_second_order(data, jitter=1e-7, remat=True))))
    for batch in (128, 512, 1024):
        U = u[None, :] + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), (batch, u.shape[0]), jnp.float32)
        t0 = time.time()
        vv, g = vg_b(U)
        jax.block_until_ready(g)
        print(f"batch-{batch} compile {time.time() - t0:.1f}s "
              f"finite {int(jnp.isfinite(vv).sum())}/{batch}", flush=True)
        reps = max(4, 2048 // batch)
        t0 = time.time()
        for _ in range(reps):
            _, g = vg_b(U)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / reps
        print(f"batch-{batch} value+grad (remat): {dt * 1e3:.1f} ms/step = "
              f"{dt / batch * 1e6:.1f} us/draw", flush=True)


if __name__ == "__main__":
    main()
