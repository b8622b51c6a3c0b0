"""Mesh-parallel indexes: corpus sharding with all-gather top-k merge."""

from tpuvec.parallel.sharding import (
    ShardedHnsw,
    load_sharded,
    make_mesh,
    save_sharded,
)

__all__ = ["ShardedHnsw", "load_sharded", "make_mesh", "save_sharded"]
