"""Parallel execution over TPU meshes (shard_map + XLA collectives)."""

from tikejax.parallel.sharding import make_mesh, run_sharded, shard_problem

__all__ = ["make_mesh", "run_sharded", "shard_problem"]
