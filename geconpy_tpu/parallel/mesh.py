"""Device-mesh utilities: chain/draw sharding over ICI.

The reference's parallelism is process-based (PyMC chain workers,
multiprocessing prior sweeps — SURVEY.md §2.9).  The TPU-native equivalent:
per-draw work (solve + filter, NUTS transitions) is already vmapped; this
module shards the batch axis over a ``jax.sharding.Mesh`` with ``shard_map``,
so chains/draws run data-parallel across chips with XLA collectives for the
small cross-chain reductions (R-hat style statistics).

All functions accept an explicit mesh so tests can run on an 8-device
virtual CPU mesh (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "pvmap", "sharded_prior_sweep"]


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def shard_batch(x, mesh: Mesh, axis_name: str = "batch"):
    """Place a batched array with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(x, sharding)


def pvmap(fn: Callable, mesh: Mesh, axis_name: str = "batch") -> Callable:
    """vmap ``fn`` over a leading batch axis sharded across the mesh.

    ``fn`` maps one example to a pytree of outputs; the returned function
    maps a batch (leading axis divisible by mesh size) to stacked outputs,
    executing each shard's slice on its own device via ``shard_map``.
    """
    from jax.experimental.shard_map import shard_map

    vfn = jax.vmap(fn)
    sharded = shard_map(
        vfn, mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
        check_rep=False,
    )
    return jax.jit(sharded)


def sharded_prior_sweep(per_draw_fn: Callable, draws: jax.Array, mesh: Mesh,
                        axis_name: str = "batch"):
    """Run ``per_draw_fn`` over a big batch of parameter draws, sharded over
    the mesh — the TPU-native version of the reference's multiprocessing
    solvability sweep (``model/statistics/perturbation_diagnostics.py:470``).

    The draw count is padded up to a multiple of the mesh size; padding rows
    are dropped from the output.
    """
    n = draws.shape[0]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        draws = jnp.concatenate([draws, jnp.repeat(draws[-1:], pad, axis=0)])
    fn = pvmap(per_draw_fn, mesh, axis_name)
    out = fn(shard_batch(draws, mesh, axis_name))
    if pad:
        out = jax.tree_util.tree_map(lambda a: a[:n], out)
    return out
