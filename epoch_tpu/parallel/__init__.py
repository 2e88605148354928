from .sharding import make_mesh, shard_state, state_shardings, make_sharded_step

__all__ = ["make_mesh", "shard_state", "state_shardings", "make_sharded_step"]
