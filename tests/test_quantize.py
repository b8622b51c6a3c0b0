"""Quantizer tests mirroring reference semantics (src/vector.rs:509-608)."""

import numpy as np

from tpuvec.quantize import (
    dequantize_int8_index,
    pack_bits_to_words,
    quantize_binary_np,
    quantize_binary_words,
    quantize_int8_for_index,
    quantize_int8_for_index_np,
    quantize_int8_np,
)


class TestAsymmetricInt8:
    def test_range_mapping(self):
        # min -> -128, max -> 127 (src/vector.rs:514-545)
        q = quantize_int8_np(np.array([0.0, 1.0]))
        assert list(q) == [-128, 127]

    def test_all_equal_is_zero(self):
        q = quantize_int8_np(np.array([3.0, 3.0, 3.0]))
        assert list(q) == [0, 0, 0]

    def test_midpoint(self):
        q = quantize_int8_np(np.array([-1.0, 0.0, 1.0]))
        assert q[0] == -128 and q[2] == 127
        assert abs(int(q[1])) <= 1  # ~middle of range


class TestIndexInt8:
    def test_fixed_scale(self):
        q = quantize_int8_for_index_np(np.array([-1.0, -0.5, 0.0, 0.5, 1.0]))
        assert list(q) == [-127, -64, 0, 64, 127]

    def test_clamping(self):
        q = quantize_int8_for_index_np(np.array([-5.0, 5.0]))
        assert list(q) == [-127, 127]

    def test_device_matches_host(self, rng):
        v = rng.standard_normal((16, 64)).astype(np.float32) * 0.7
        host = quantize_int8_for_index_np(v)
        dev = np.asarray(quantize_int8_for_index(v))
        # identical except possibly exact .5 midpoints (measure zero here)
        assert np.mean(host == dev) > 0.999

    def test_dequantize_roundtrip(self, rng):
        v = np.clip(rng.standard_normal((4, 32)).astype(np.float32), -1, 1)
        q = quantize_int8_for_index_np(v)
        back = np.asarray(dequantize_int8_index(q))
        assert np.max(np.abs(back - v)) <= (0.5 / 127) + 1e-6


class TestBinary:
    def test_mean_threshold(self):
        bits = quantize_binary_np(np.array([1.0, 2.0, 3.0, 4.0]))
        # mean = 2.5; >= mean is 1
        assert list(bits) == [0, 0, 1, 1]

    def test_words_match_bits(self, rng):
        v = rng.standard_normal((8, 64)).astype(np.float32)
        bits = quantize_binary_np(v)
        words = np.asarray(quantize_binary_words(v))
        expect = np.asarray(pack_bits_to_words(bits.astype(np.uint32)))
        assert np.array_equal(words, expect)

    def test_word_packing_lsb(self):
        bits = np.zeros((1, 32), dtype=np.uint32)
        bits[0, 0] = 1
        bits[0, 31] = 1
        w = np.asarray(pack_bits_to_words(bits))
        assert w[0, 0] == np.uint32(0x80000001)
