"""Distance kernel tests vs numpy ground truth, mirroring the reference's
distance unit tests (src/distance/scalar.rs:114-213) at batch scale."""

import numpy as np
import pytest

from tpuvec.ops import (
    cosine_pairwise,
    gathered_internal,
    hamming_pairwise,
    internal_pairwise,
    internal_to_output,
    l1_pairwise,
    l2_pairwise,
    sq_l2_pairwise,
)
from tpuvec.quantize import pack_bits_to_words
from tpuvec.types import DistanceMetric


def np_l2(q, x):
    return np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))


def np_l1(q, x):
    return np.abs(q[:, None, :] - x[None, :, :]).sum(-1)


def np_cos(q, x):
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return 1.0 - qn @ xn.T


DIMS = [128, 384, 768, 1024]


@pytest.mark.parametrize("d", DIMS)
def test_f32_metrics_match_numpy(rng, d):
    q = rng.standard_normal((4, d)).astype(np.float32)
    x = rng.standard_normal((32, d)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(l2_pairwise(q, x)), np_l2(q, x), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(l1_pairwise(q, x)), np_l1(q, x), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(cosine_pairwise(q, x)), np_cos(q, x), rtol=1e-3, atol=1e-4)


def test_simple_values():
    # reference scalar.rs unit cases: (1,2,3) vs (4,5,6) -> L2 = sqrt(27)
    q = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    x = np.array([[4.0, 5.0, 6.0]], dtype=np.float32)
    assert np.isclose(np.asarray(l2_pairwise(q, x))[0, 0], np.sqrt(27.0), rtol=1e-6)
    assert np.isclose(np.asarray(l1_pairwise(q, x))[0, 0], 9.0)
    # identical vectors: zero distance
    assert np.isclose(np.asarray(sq_l2_pairwise(q, q))[0, 0], 0.0, atol=1e-5)
    assert np.isclose(np.asarray(cosine_pairwise(q, q))[0, 0], 0.0, atol=1e-6)


def test_cosine_orthogonal_and_opposite():
    q = np.array([[1.0, 0.0]], dtype=np.float32)
    x = np.array([[0.0, 1.0], [-1.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    d = np.asarray(cosine_pairwise(q, x))[0]
    np.testing.assert_allclose(d, [1.0, 2.0, 0.0], atol=1e-6)


def test_cosine_zero_norm_guard():
    q = np.zeros((1, 4), dtype=np.float32)
    x = np.ones((1, 4), dtype=np.float32)
    assert np.isclose(np.asarray(cosine_pairwise(q, x))[0, 0], 1.0)


def test_int8_exact_int32_accum(rng):
    q = rng.integers(-127, 128, (4, 1024)).astype(np.int8)
    x = rng.integers(-127, 128, (16, 1024)).astype(np.int8)
    got = np.asarray(sq_l2_pairwise(q, x))
    expect = (
        (q.astype(np.int64)[:, None, :] - x.astype(np.int64)[None, :, :]) ** 2
    ).sum(-1)
    assert np.array_equal(got.astype(np.int64), expect)  # exact, not approx


def test_int8_cosine(rng):
    q = rng.integers(-127, 128, (3, 128)).astype(np.int8)
    x = rng.integers(-127, 128, (7, 128)).astype(np.int8)
    got = np.asarray(cosine_pairwise(q, x))
    expect = np_cos(q.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_hamming(rng):
    bits_q = (rng.random((2, 256)) > 0.5).astype(np.uint32)
    bits_x = (rng.random((9, 256)) > 0.5).astype(np.uint32)
    qw = np.asarray(pack_bits_to_words(bits_q))
    xw = np.asarray(pack_bits_to_words(bits_x))
    got = np.asarray(hamming_pairwise(qw, xw))
    expect = (bits_q[:, None, :] != bits_x[None, :, :]).sum(-1)
    assert np.array_equal(got.astype(np.int64), expect)


def test_gathered_matches_pairwise(rng):
    q = rng.standard_normal((5, 128)).astype(np.float32)
    x = rng.standard_normal((40, 128)).astype(np.float32)
    idx = rng.integers(0, 40, (5, 8))
    nbrs = x[idx]
    for metric in [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.L1]:
        full = np.asarray(internal_pairwise(metric, q, x))
        gathered = np.asarray(gathered_internal(metric, q, nbrs))
        expect = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(gathered, expect, rtol=1e-4, atol=1e-3)


def test_internal_to_output_cosine_trick(rng):
    # normalized internal sq-L2 / 2 == cosine distance (src/hnsw/mod.rs:139-146)
    q = rng.standard_normal((3, 64)).astype(np.float32)
    x = rng.standard_normal((10, 64)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    internal = np.asarray(
        internal_pairwise(DistanceMetric.COSINE, qn, xn, normalized=True)
    )
    out = np.asarray(
        internal_to_output(DistanceMetric.COSINE, internal, normalized=True)
    )
    np.testing.assert_allclose(out, np_cos(q, x), rtol=1e-4, atol=1e-5)


def test_l2_output_is_sqrt(rng):
    q = rng.standard_normal((2, 32)).astype(np.float32)
    x = rng.standard_normal((6, 32)).astype(np.float32)
    internal = np.asarray(internal_pairwise(DistanceMetric.L2, q, x))
    out = np.asarray(internal_to_output(DistanceMetric.L2, internal))
    np.testing.assert_allclose(out, np_l2(q, x), rtol=1e-4, atol=1e-4)
