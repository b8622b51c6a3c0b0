"""Quantizers, with semantics matching the reference exactly.

Three quantizers (reference src/vector.rs:509-608):

* ``quantize_int8``            — per-vector asymmetric: [min,max] -> [-128,127].
                                 Not distance-comparable across vectors.
* ``quantize_int8_for_index``  — fixed-scale symmetric: clamp [-1,1] -> [-127,127].
                                 Used for int8 HNSW index storage.
* ``quantize_binary``          — mean threshold -> sign bits (>= mean is 1).

Each has a numpy (host, exact reference semantics incl. rounding) and a jnp
(device, batched) form. Device forms operate on 2D [N, D] arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_int8_np",
    "quantize_int8_for_index_np",
    "quantize_binary_np",
    "quantize_int8_for_index",
    "quantize_binary_words",
    "pack_bits_to_words",
    "dequantize_int8_index",
]

INT8_INDEX_SCALE = 127.0  # [-1, 1] * 127 (reference src/vector.rs:554-575)


# --------------------------------------------------------------------------
# Host (numpy) — exact reference semantics
# --------------------------------------------------------------------------


def quantize_int8_np(v: np.ndarray) -> np.ndarray:
    """Per-vector asymmetric quantization (src/vector.rs:514-545).

    Maps [min, max] -> [-128, 127] with round-half-away-from-zero like
    Rust's f32::round. All-equal vectors quantize to zeros.
    """
    v = np.asarray(v, dtype=np.float32)
    mn, mx = float(v.min()), float(v.max())
    if mn == mx:
        return np.zeros(v.shape, dtype=np.int8)
    normalized = (v - mn) / (mx - mn)
    scaled = normalized * 255.0 - 128.0
    # Rust f32::round = half away from zero; np.round is half-to-even.
    rounded = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    return np.clip(rounded, -128, 127).astype(np.int8)


def quantize_int8_for_index_np(v: np.ndarray) -> np.ndarray:
    """Fixed-scale symmetric quantization (src/vector.rs:554-575)."""
    v = np.asarray(v, dtype=np.float32)
    clamped = np.clip(v, -1.0, 1.0) * INT8_INDEX_SCALE
    rounded = np.sign(clamped) * np.floor(np.abs(clamped) + 0.5)
    return rounded.astype(np.int8)


def quantize_binary_np(v: np.ndarray) -> np.ndarray:
    """Mean-threshold binarization -> 0/1 uint8 array (src/vector.rs:579-608).

    Returns unpacked bits; pack with tpuvec.codec.pack_bits for blob form.
    """
    v = np.asarray(v, dtype=np.float32)
    mean = v.mean(axis=-1, keepdims=True)
    return (v >= mean).astype(np.uint8)


# --------------------------------------------------------------------------
# Device (jnp) — batched forms for index construction / query prep
# --------------------------------------------------------------------------


def quantize_int8_for_index(v: jnp.ndarray) -> jnp.ndarray:
    """Batched fixed-scale symmetric int8 quantization on device.

    jnp.round is half-to-even; the reference rounds half-away. The midpoint
    set has measure ~0 for real embeddings so recall is unaffected; host-side
    exact semantics live in quantize_int8_for_index_np.
    """
    clamped = jnp.clip(v.astype(jnp.float32), -1.0, 1.0) * INT8_INDEX_SCALE
    return jnp.round(clamped).astype(jnp.int8)


def dequantize_int8_index(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quantize_int8_for_index (up to rounding)."""
    return q.astype(jnp.float32) / INT8_INDEX_SCALE


def pack_bits_to_words(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack a 0/1 array [..., D] into uint32 words [..., D/32], LSB-first.

    Word w bit b corresponds to element 32*w + b, consistent with the byte
    LSB-first layout of tpuvec.codec.pack_bits (little-endian words).
    """
    d = bits.shape[-1]
    assert d % 32 == 0, "bit dimension must be padded to a multiple of 32"
    b = bits.astype(jnp.uint32).reshape(*bits.shape[:-1], d // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


def quantize_binary_words(v: jnp.ndarray) -> jnp.ndarray:
    """Batched mean-threshold binarization -> packed uint32 words on device."""
    mean = jnp.mean(v, axis=-1, keepdims=True)
    return pack_bits_to_words((v >= mean).astype(jnp.uint32))
