"""Columnar vector store: VecTable + snapshot persistence."""

from tpuvec.store.table import ColumnSpec, VecTable

__all__ = ["VecTable", "ColumnSpec"]
