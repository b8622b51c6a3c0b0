"""Core enums and error types.

Capability parity with the reference's ``src/vector.rs:9-83`` (VectorType,
IndexQuantization), ``src/distance/mod.rs:12-46`` (DistanceMetric) and
``src/error.rs:5-38`` (error enum) — re-expressed as Python enums/exceptions
rather than a port.
"""

from __future__ import annotations

import enum


class VectorType(enum.Enum):
    """Vector element type (reference: src/vector.rs:9-47)."""

    FLOAT32 = "float32"
    INT8 = "int8"
    BIT = "bit"

    @classmethod
    def parse(cls, s: str) -> "VectorType":
        m = {
            "float32": cls.FLOAT32,
            "float": cls.FLOAT32,
            "int8": cls.INT8,
            "bit": cls.BIT,
            "binary": cls.BIT,
        }
        key = s.strip().lower()
        if key not in m:
            raise InvalidVectorType(f"Invalid vector type: '{s}'")
        return m[key]

    @property
    def bytes_per_element(self) -> float:
        if self is VectorType.FLOAT32:
            return 4
        if self is VectorType.INT8:
            return 1
        return 0.125  # BIT: 8 elements per byte

    def blob_nbytes(self, dimensions: int) -> int:
        """Size in bytes of a canonical blob for `dimensions` elements."""
        if self is VectorType.FLOAT32:
            return 4 * dimensions
        if self is VectorType.INT8:
            return dimensions
        return (dimensions + 7) // 8


class DistanceMetric(enum.Enum):
    """Distance metric (reference: src/distance/mod.rs:12-46).

    L2     = sqrt(sum((a-b)^2))
    L1     = sum(|a-b|)
    COSINE = 1 - (a.b)/(|a||b|)
    HAMMING= count of differing bits
    """

    L2 = "l2"
    L1 = "l1"
    COSINE = "cosine"
    HAMMING = "hamming"

    @classmethod
    def parse(cls, s: str) -> "DistanceMetric":
        m = {
            "l2": cls.L2,
            "euclidean": cls.L2,
            "l1": cls.L1,
            "manhattan": cls.L1,
            "cosine": cls.COSINE,
            "hamming": cls.HAMMING,
        }
        key = s.strip().lower()
        if key not in m:
            raise InvalidDistanceMetric(f"Invalid distance metric: '{s}'")
        return m[key]


class IndexQuantization(enum.Enum):
    """How vectors are stored inside the HNSW index (src/vector.rs:54-83).

    Main storage always keeps original precision; the index copy may be
    quantized. NONE = original precision; INT8 = fixed-scale symmetric int8
    ([-1,1] -> [-127,127], 4x space savings); BINARY goes beyond the
    reference's composed surface: mean-threshold sign bits + Hamming coarse
    search with f32 rerank.
    """

    NONE = "none"
    INT8 = "int8"
    BINARY = "binary"

    @classmethod
    def parse(cls, s: str) -> "IndexQuantization":
        key = s.strip().lower()
        m = {"none": cls.NONE, "int8": cls.INT8, "binary": cls.BINARY}
        if key not in m:
            raise InvalidParameter(
                f"Invalid index_quantization value: '{s}'. Use 'none', 'int8' or 'binary'"
            )
        return m[key]


class IndexType(enum.Enum):
    """Table-level index type (reference: src/vtab.rs:738-750)."""

    HNSW = "hnsw"
    ENN = "enn"  # exact nearest neighbor: brute-force scan

    @classmethod
    def parse(cls, s: str) -> "IndexType":
        key = s.strip().lower()
        m = {"hnsw": cls.HNSW, "enn": cls.ENN}
        if key not in m:
            raise InvalidParameter(f"Invalid index type: '{s}'. Use 'hnsw' or 'enn'")
        return m[key]


# --------------------------------------------------------------------------
# Errors (reference: src/error.rs:5-38)
# --------------------------------------------------------------------------


class TpuVecError(Exception):
    """Base error for tpuvec."""


class InvalidVectorFormat(TpuVecError):
    pass


class DimensionMismatch(TpuVecError):
    def __init__(self, expected: int, actual: int):
        super().__init__(f"Dimension mismatch: expected {expected}, got {actual}")
        self.expected = expected
        self.actual = actual


class InvalidVectorType(TpuVecError):
    pass


class InvalidDistanceMetric(TpuVecError):
    pass


class HnswError(TpuVecError):
    pass


class NotImplementedTpuVec(TpuVecError):
    pass


class InvalidParameter(TpuVecError):
    pass


class InvalidState(TpuVecError):
    pass


class JsonParse(TpuVecError):
    pass
