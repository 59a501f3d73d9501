from .mesh import make_mesh, sharded_map_step, sharded_call_step

__all__ = ["make_mesh", "sharded_map_step", "sharded_call_step"]
