"""Measure the Pallas fused beam kernel vs the XLA path on the real TPU
(round-2 VERDICT item #7: the kernel compiles + matches bit-for-bit but
was never timed on hardware — measure it and decide default-on/off).

Builds (or reuses the suite checkpoint of) the 100K x 768 cosine graph,
then times search_graph with use_pallas False/True at several (ef, B)
points with distinct-input reps, asserting identical results.

Usage: python scripts/probe_pallas_beam.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tpuvec.index import HnswParams
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings
from tpuvec.utils.safecache import enable_atomic_cache_writes
from tpuvec.utils.transfer import prepare_vectors_device

enable_atomic_cache_writes()

N, D, K, REPS = 100_000, 768, 10, 5


def log(*a):
    print(*a, flush=True)


def main():
    data = synthetic_embeddings(N + 256 * (REPS + 1), D, seed=0)
    x, qpool = data[:N], data[N:]
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
    xp = prepare_vectors_device(cfg, x)
    t0 = time.time()
    state = build_graph(cfg, xp, ids=np.arange(N, dtype=np.int32), max_batch=1024)
    state.count.block_until_ready()
    log(f"build: {N / (time.time() - t0):.0f} vec/s")
    del xp

    for qn in (64, 256):
        reps = [
            prepare_vectors(cfg, jnp.asarray(qpool[i * qn : (i + 1) * qn]))
            for i in range(REPS + 1)
        ]
        jax.block_until_ready(reps)
        for ef in (16, 32, 64):
            out = {}
            for pallas in (False, True):
                d0, i0 = search_graph(
                    cfg, state, reps[0], k=K, ef=ef, use_pallas=pallas
                )
                i0.block_until_ready()
                t0 = time.time()
                rs = [
                    search_graph(
                        cfg, state, reps[i + 1], k=K, ef=ef, use_pallas=pallas
                    )[1]
                    for i in range(REPS)
                ]
                jax.block_until_ready(rs)
                dt = (time.time() - t0) / REPS
                out[pallas] = (np.asarray(i0), qn / dt)
            same = (out[False][0] == out[True][0]).mean()
            log(
                f"B={qn:4d} ef={ef:3d}: XLA {out[False][1]:8.0f} QPS | "
                f"Pallas {out[True][1]:8.0f} QPS "
                f"({out[True][1] / out[False][1]:.2f}x, ids agree {same:.4f})"
            )


if __name__ == "__main__":
    main()
