"""Exact brute-force KNN vs numpy ground truth (the reference computes
ENN the same way in src/vtab.rs:2573-2623 and ground truth in
tests/test_recall_accuracy.rs)."""

import numpy as np
import pytest

from tpuvec.index import bruteforce_knn
from tpuvec.quantize import pack_bits_to_words
from tpuvec.types import DistanceMetric


def np_ground_truth(metric, q, x, k):
    if metric is DistanceMetric.L2:
        d = np.sqrt(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    elif metric is DistanceMetric.L1:
        d = np.abs(q[:, None, :] - x[None, :, :]).sum(-1)
    elif metric is DistanceMetric.COSINE:
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
        d = 1 - qn @ xn.T
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize(
    "metric", [DistanceMetric.L2, DistanceMetric.L1, DistanceMetric.COSINE]
)
def test_exact_f32(rng, metric):
    q = rng.standard_normal((8, 128)).astype(np.float32)
    x = rng.standard_normal((2000, 128)).astype(np.float32)
    valid = np.ones(2000, dtype=bool)
    gd, gi = np_ground_truth(metric, q, x, 10)
    d, i = bruteforce_knn(q, x, valid, metric=metric, k=10, chunk=512)
    d, i = np.asarray(d), np.asarray(i)
    # id sets must match exactly (ties can permute within equal distance)
    for b in range(8):
        assert set(i[b]) == set(gi[b]), f"query {b}: {i[b]} vs {gi[b]}"
    np.testing.assert_allclose(d, gd, rtol=1e-4, atol=1e-4)
    # ascending order
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_validity_mask(rng):
    q = rng.standard_normal((2, 64)).astype(np.float32)
    x = rng.standard_normal((100, 64)).astype(np.float32)
    valid = np.ones(100, dtype=bool)
    valid[::2] = False  # only odd ids valid
    _, i = bruteforce_knn(q, x, valid, metric=DistanceMetric.L2, k=5, chunk=64)
    assert np.all(np.asarray(i) % 2 == 1)


def test_k_larger_than_valid(rng):
    q = rng.standard_normal((1, 32)).astype(np.float32)
    x = rng.standard_normal((10, 32)).astype(np.float32)
    valid = np.zeros(10, dtype=bool)
    valid[:3] = True
    d, i = bruteforce_knn(q, x, valid, metric=DistanceMetric.L2, k=5)
    d, i = np.asarray(d), np.asarray(i)
    assert np.isfinite(d[0, :3]).all()
    assert np.isinf(d[0, 3:]).all()
    assert list(i[0, 3:]) == [-1, -1]


def test_unaligned_n(rng):
    # N not a multiple of the chunk — padding must not leak into results
    q = rng.standard_normal((3, 64)).astype(np.float32)
    x = rng.standard_normal((777, 64)).astype(np.float32)
    valid = np.ones(777, dtype=bool)
    gd, gi = np_ground_truth(DistanceMetric.L2, q, x, 7)
    d, i = bruteforce_knn(q, x, valid, metric=DistanceMetric.L2, k=7, chunk=256)
    for b in range(3):
        assert set(np.asarray(i)[b]) == set(gi[b])


def test_int8(rng):
    q = rng.integers(-127, 128, (4, 128)).astype(np.int8)
    x = rng.integers(-127, 128, (500, 128)).astype(np.int8)
    valid = np.ones(500, dtype=bool)
    d, i = bruteforce_knn(q, x, valid, metric=DistanceMetric.L2, k=5, chunk=128)
    exact = np.sqrt(
        ((q.astype(np.int64)[:, None] - x.astype(np.int64)[None]) ** 2).sum(-1)
    )
    gi = np.argsort(exact, axis=1)[:, :5]
    for b in range(4):
        assert set(np.asarray(i)[b]) == set(gi[b])


def test_hamming(rng):
    bits_q = (rng.random((2, 512)) > 0.5).astype(np.uint32)
    bits_x = (rng.random((300, 512)) > 0.5).astype(np.uint32)
    qw = np.asarray(pack_bits_to_words(bits_q))
    xw = np.asarray(pack_bits_to_words(bits_x))
    valid = np.ones(300, dtype=bool)
    d, i = bruteforce_knn(qw, xw, valid, metric=DistanceMetric.HAMMING, k=4, chunk=128)
    exact = (bits_q[:, None, :] != bits_x[None, :, :]).sum(-1)
    gd = np.sort(exact, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(d).astype(np.int64), gd)
