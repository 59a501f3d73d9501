"""Mesh + multi-process scale-out.

``mesh`` is imported lazily: importing it pulls device-op modules whose
module-level jnp constants initialize the XLA backend, which must not
happen before ``jax.distributed.initialize`` in multi-process drivers
(init_distributed must be importable/callable first).
"""

from .distributed import (init_distributed, partition_files,
                          partition_intervals, run_mapper_distributed)

_MESH_EXPORTS = ("make_mesh", "sharded_map_step", "sharded_call_step",
                 "sharded_fused_step2", "shard_units")

__all__ = ["init_distributed", "partition_files", "partition_intervals",
           "run_mapper_distributed", *_MESH_EXPORTS]


def __getattr__(name):
    if name in _MESH_EXPORTS:
        from . import mesh
        return getattr(mesh, name)
    raise AttributeError(name)
