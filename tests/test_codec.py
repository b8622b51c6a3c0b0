"""Codec tests mirroring the reference's vector unit tests
(src/vector.rs:638-960) and SQL decode rules (src/sql_functions.rs:50-95)."""

import json

import numpy as np
import pytest

from tpuvec.codec import Vector, pack_bits, unpack_bits
from tpuvec.types import (
    DimensionMismatch,
    InvalidVectorFormat,
    InvalidVectorType,
    JsonParse,
    VectorType,
)


class TestBlobFormat:
    def test_f32_blob_little_endian(self):
        v = Vector.from_f32([1.0, -2.5, 3.25])
        assert v.dimensions == 3
        assert v.data == np.array([1.0, -2.5, 3.25], dtype="<f4").tobytes()

    def test_i8_blob(self):
        v = Vector.from_i8([-128, 0, 127])
        assert v.data == bytes([0x80, 0x00, 0x7F])

    def test_bit_blob_lsb_first(self):
        # bit i of a byte is element 8*byte+i (reference src/vector.rs:598-602)
        v = Vector.from_bits([1, 0, 0, 0, 0, 0, 0, 0, 1])
        assert v.dimensions == 9
        assert v.data == bytes([0b0000_0001, 0b0000_0001])

    def test_pack_unpack_roundtrip(self, rng):
        bits = (rng.random(77) > 0.5).astype(np.uint8)
        assert np.array_equal(unpack_bits(pack_bits(bits), 77), bits)


class TestFromBlob:
    def test_f32_size_validation(self):
        with pytest.raises(InvalidVectorFormat):
            Vector.from_blob(b"\x00\x00\x00", VectorType.FLOAT32)
        with pytest.raises(InvalidVectorFormat):
            Vector.from_blob(b"", VectorType.FLOAT32)

    def test_f32_dims_inferred(self):
        v = Vector.from_blob(bytes(16), VectorType.FLOAT32)
        assert v.dimensions == 4

    def test_i8_dims_inferred(self):
        assert Vector.from_blob(bytes(7), VectorType.INT8).dimensions == 7

    def test_bit_dims_inferred(self):
        assert Vector.from_blob(bytes(2), VectorType.BIT).dimensions == 16

    def test_explicit_dims_mismatch(self):
        with pytest.raises(InvalidVectorFormat):
            Vector.from_blob(bytes(16), VectorType.FLOAT32, dimensions=3)


class TestJson:
    def test_f32_roundtrip(self):
        v = Vector.from_json("[1.0, 2.5, -3.0]", VectorType.FLOAT32)
        assert np.allclose(v.as_f32(), [1.0, 2.5, -3.0])
        assert json.loads(v.to_json()) == [1.0, 2.5, -3.0]

    def test_i8_from_json(self):
        v = Vector.from_json("[1, -2, 127]", VectorType.INT8)
        assert list(v.as_i8()) == [1, -2, 127]

    def test_bit_from_json(self):
        v = Vector.from_json("[1, 0, 1, 1]", VectorType.BIT)
        assert list(v.as_bits()) == [1, 0, 1, 1]

    def test_invalid_json(self):
        with pytest.raises(JsonParse):
            Vector.from_json("not json", VectorType.FLOAT32)

    def test_non_array_json(self):
        with pytest.raises(InvalidVectorFormat):
            Vector.from_json('{"a": 1}', VectorType.FLOAT32)

    def test_empty_json(self):
        with pytest.raises(InvalidVectorFormat):
            Vector.from_json("[]", VectorType.FLOAT32)

    def test_sql_value_dispatch(self):
        a = Vector.from_sql_value("[1.0, 2.0]", VectorType.FLOAT32)
        b = Vector.from_sql_value(a.as_bytes(), VectorType.FLOAT32)
        assert np.array_equal(a.as_f32(), b.as_f32())
        with pytest.raises(InvalidVectorFormat):
            Vector.from_sql_value(42, VectorType.FLOAT32)


class TestOps:
    def test_add_sub_f32(self):
        a = Vector.from_f32([1.0, 2.0])
        b = Vector.from_f32([0.5, -1.0])
        assert np.allclose(a.add(b).as_f32(), [1.5, 1.0])
        assert np.allclose(a.sub(b).as_f32(), [0.5, 3.0])

    def test_add_i8_saturates(self):
        a = Vector.from_i8([120, -120])
        b = Vector.from_i8([20, -20])
        assert list(a.add(b).as_i8()) == [127, -128]

    def test_dimension_mismatch(self):
        with pytest.raises(DimensionMismatch):
            Vector.from_f32([1.0]).add(Vector.from_f32([1.0, 2.0]))

    def test_type_mismatch(self):
        with pytest.raises(InvalidVectorType):
            Vector.from_f32([1.0]).add(Vector.from_i8([1]))

    def test_normalize(self):
        v = Vector.from_f32([3.0, 4.0]).normalize()
        assert np.allclose(v.as_f32(), [0.6, 0.8])
        z = Vector.from_f32([0.0, 0.0]).normalize()
        assert np.allclose(z.as_f32(), [0.0, 0.0])

    def test_slice(self):
        v = Vector.from_f32([1.0, 2.0, 3.0, 4.0]).slice(1, 3)
        assert np.allclose(v.as_f32(), [2.0, 3.0])
        with pytest.raises(InvalidVectorFormat):
            Vector.from_f32([1.0]).slice(0, 2)

    def test_slice_bits(self):
        v = Vector.from_bits([1, 0, 1, 1, 0, 0, 1, 0, 1]).slice(2, 9)
        assert list(v.as_bits()) == [1, 1, 0, 0, 1, 0, 1]


class TestInt8Saturation:
    def test_from_json_saturates_like_rust_as(self):
        # Rust float->int `as i8` saturates (src/vector.rs:251-254):
        # 300 -> 127, -300 -> -128, NaN -> 0, 3.9 -> 3 (trunc toward zero)
        from tpuvec.codec import Vector
        from tpuvec.types import VectorType

        v = Vector.from_json("[300, -300, 3.9, -3.9, 127, -128]", VectorType.INT8)
        assert v.as_i8().tolist() == [127, -128, 3, -3, 127, -128]
