"""Fused Pallas beam-update kernel vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.params import HnswParams
from tpuvec.index.search import search_graph
from tpuvec.ops.pallas_beam import beam_update, beam_update_reference
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings


@pytest.mark.parametrize("e", [1, 2])
def test_kernel_matches_reference(rng, e):
    b, efp, w = 8, 128, 128
    bd = np.sort(rng.standard_normal((b, efp)).astype(np.float32), axis=1)
    bi = rng.integers(0, 5000, (b, efp)).astype(np.int32)
    bx = rng.random((b, efp)) > 0.7
    nbrs = rng.integers(-1, 5000, (b, w)).astype(np.int32)
    nd = rng.standard_normal((b, w)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (bd, bi, bx, nbrs, nd))
    ref = beam_update_reference(*args, n_expand=e)
    ker = beam_update(*args, n_expand=e, interpret=True)
    for r, k_, name in zip(ref, ker, ["d", "i", "x", "cand", "active"]):
        assert np.array_equal(np.asarray(r), np.asarray(k_)), name


def test_search_pallas_path_matches_xla():
    n, d = 300, 32
    data = synthetic_embeddings(n + 8, d, intrinsic_dim=12, n_clusters=16, seed=6)
    cfg = config_for(
        d,
        metric=DistanceMetric.L2,
        cap=512,
        params=HnswParams(m=8, max_m0=16, ef_construction=64, ef_search=32),
    )
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(data[:n])))
    state = build_graph(cfg, xp, max_batch=64)
    qp = prepare_vectors(cfg, jnp.asarray(data[n:]))
    d_x, i_x = search_graph(cfg, state, qp, k=5, ef=32)
    d_p, i_p = search_graph(cfg, state, qp, k=5, ef=32, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_p), rtol=1e-6)
