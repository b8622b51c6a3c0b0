"""Sweep runner smoke test (mirrors test_recall_perf.rs shape)."""

import numpy as np
import jax.numpy as jnp

from tpuvec.bench_utils import recall_qps_sweep
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.params import HnswParams
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings


def test_sweep_monotone_recall():
    n, d = 400, 32
    data = synthetic_embeddings(n + 16, d, intrinsic_dim=12, n_clusters=16, seed=4)
    cfg = config_for(
        d,
        metric=DistanceMetric.L2,
        cap=512,
        params=HnswParams(m=8, max_m0=16, ef_construction=64, ef_search=32),
    )
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(data[:n])))
    state = build_graph(cfg, xp, max_batch=64)
    qp = prepare_vectors(cfg, jnp.asarray(data[n:]))
    points = recall_qps_sweep(cfg, state, qp, k=5, efs=(8, 32), reps=2)
    assert len(points) == 2
    assert points[1].recall >= points[0].recall - 0.05  # bigger ef not worse
    assert points[0].recall > 0.7
    for p in points:
        assert p.qps > 0 and p.ms_per_batch > 0
