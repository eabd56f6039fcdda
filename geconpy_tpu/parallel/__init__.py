"""Device-mesh utilities: chain/draw sharding over ICI (see mesh.py)."""

from .mesh import make_mesh, pvmap, shard_batch, sharded_prior_sweep

__all__ = ["make_mesh", "pvmap", "shard_batch", "sharded_prior_sweep"]
