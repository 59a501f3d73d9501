from .mesh import make_mesh, sharded_map_step, sharded_call_step
from .distributed import init_distributed, partition_files, partition_intervals

__all__ = ["make_mesh", "sharded_map_step", "sharded_call_step",
           "init_distributed", "partition_files", "partition_intervals"]
