"""Scaling out: device meshes, sharded sweeps, pooled chains, Pallas kernels.

How the framework uses TPU hardware (no counterpart in the reference —
its parallelism is process-based multiprocessing/PyMC workers):

- every per-draw computation (solve + filter) is vmap-safe by construction
  (static shapes, flag-based failure), so batching is free;
- batches shard over a ``jax.sharding.Mesh`` with ``shard_map`` — XLA
  inserts the ICI collectives;
- NUTS chains can pool their adaptation statistics across the mesh
  (psum/pmean), so 8 chips adapt as one 8x-wider sampler;
- the hottest path (policy solve + stationary Kalman, value+grad for NUTS)
  has lane-batched Pallas TPU kernels: ``fit(policy="pallas")``.

This script runs anywhere by forcing an 8-device *virtual* CPU mesh — the
same code drives real TPU meshes (it is what `__graft_entry__.
dryrun_multichip` validates).

Run:  python examples/09_scaling_on_tpu.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

# Force 8 virtual devices BEFORE jax initializes (demo-friendly; on a real
# TPU pod slice, delete these two lines and the same mesh code runs on ICI).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import geconpy_tpu as gt
from geconpy_tpu.parallel.mesh import make_mesh, sharded_prior_sweep
from geconpy_tpu.stats.statespace import DSGEStateSpace


def main(fast: bool = False):
    print(f"devices: {jax.device_count()}")
    mesh = make_mesh()

    # ---- 1. Sharded prior-solvability sweep: thousands of prior draws,
    # each solving the model end-to-end, split across the mesh.
    model = gt.model_from_gcn(gt.get_example_gcn("rbc_estimation"),
                              verbose=False)
    df = gt.prior_solvability_check(model, n_samples=64 if fast else 512,
                                    mesh=mesh)
    print(f"prior solvability: {df['success'].mean() * 100:.1f}% of "
          f"{len(df)} draws solve cleanly")

    # ---- 2. Sharded custom sweeps: any per-draw function.
    ss_mod = DSGEStateSpace(model)
    ss_mod.configure(observed_states=["Y", "C"],
                     measurement_error={"Y": 0.01, "C": 0.01},
                     filter_type="stationary")
    data, _ = ss_mod.data_from_prior(jax.random.PRNGKey(0), periods=100)
    logpost = ss_mod.build_logpost(np.asarray(data))

    n_draws = 64 if fast else 1024
    u0 = ss_mod.initial_position()
    U = np.asarray(u0)[None, :] + 0.1 * np.random.default_rng(0).normal(
        size=(n_draws, u0.shape[0]))
    lls = sharded_prior_sweep(logpost, np.asarray(U, dtype=u0.dtype), mesh)
    finite = np.isfinite(np.asarray(lls))
    print(f"sharded logpost sweep: {n_draws} draws, "
          f"{100 * finite.mean():.1f}% finite")

    # ---- 3. Mesh-pooled NUTS: chains shard over devices and share
    # adaptation via collectives (pooled_adaptation=True inside fit uses
    # psum/pmean; see stats/nuts.py).
    res = gt.fit(ss_mod, data, num_chains=8, num_warmup=30 if fast else 200,
                 num_samples=30 if fast else 200, seed=1,
                 pooled_adaptation=True)
    print("\npooled-adaptation NUTS on the mesh:")
    print(res.summary().round(3).head())

    # ---- 4. On a real TPU the same fit takes policy="pallas": lockstep
    # chains route the policy solve + Kalman value+grad through lane-
    # batched Pallas kernels (55 us/draw value+grad on SW-2007 at batch
    # 512 vs 183 for the plain XLA path; see docs/roadmap.md).
    print('\non TPU: gt.fit(ss_mod, data, policy="pallas", '
          'filter_type="stationary") uses the Pallas hot path')
    return res


if __name__ == "__main__":
    main(fast="--fast" in sys.argv)
