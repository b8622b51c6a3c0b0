"""Chunked transfer utilities."""

import numpy as np
import jax.numpy as jnp

from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.params import HnswParams
from tpuvec.types import DistanceMetric
from tpuvec.utils.transfer import (
    prepare_vectors_chunked,
    prepare_vectors_device,
    to_device_chunked,
)


def test_to_device_chunked_matches(rng):
    x = rng.standard_normal((1000, 32)).astype(np.float32)
    a = np.asarray(to_device_chunked(x, chunk_bytes=32 * 64))
    np.testing.assert_array_equal(a, x)


def test_prepare_chunked_matches_direct(rng):
    cfg = config_for(32, metric=DistanceMetric.COSINE, cap=128,
                     params=HnswParams(m=4, max_m0=8, ef_construction=32, ef_search=16))
    x = rng.standard_normal((300, 32)).astype(np.float32)
    direct = np.asarray(prepare_vectors(cfg, jnp.asarray(x)))
    chunked = prepare_vectors_chunked(cfg, x, chunk_rows=64)
    dev = np.asarray(prepare_vectors_device(cfg, x, chunk_rows=64))
    np.testing.assert_allclose(chunked, direct, rtol=1e-6)
    np.testing.assert_allclose(dev, direct, rtol=1e-6)
