"""Index engines: exact brute-force (ENN) and HNSW over device arrays."""

from tpuvec.index.bruteforce import bruteforce_knn
from tpuvec.index.params import HnswParams

__all__ = ["bruteforce_knn", "HnswParams"]
