"""Mesh-parallel indexes: corpus sharding with all-gather top-k merge."""

from tpuvec.parallel.sharding import ShardedHnsw, make_mesh

__all__ = ["ShardedHnsw", "make_mesh"]
