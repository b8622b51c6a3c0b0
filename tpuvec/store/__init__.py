"""Columnar vector store: VecTable + snapshot persistence + followers."""

from tpuvec.store.follower import SnapshotFollower, writer_lock
from tpuvec.store.table import ColumnSpec, VecTable

__all__ = ["VecTable", "ColumnSpec", "SnapshotFollower", "writer_lock"]
