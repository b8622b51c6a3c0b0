"""Build-rate vs graph-quality sweep (VERDICT round-2 item #2).

The construction candidate beam dominates insert cost and is bound by
the gathered-row count per iteration (ROUND_NOTES); both knobs below cut
iterations directly:

  * ef_construction — beam width; max_iters derives from it (3*ef/2E+8)
  * build_max_iters — explicit cap on the construction beam (HnswParams)

For each variant this builds 100K x 768 cosine (m=16/M0=32) from scratch
on the real TPU, reports end-to-end + marginal build rate, and validates
graph quality via recall@10 against the exact oracle at ef=24/48.

Usage: python scripts/probe_build_rate.py [variant...]
  variant = efc[:iters], e.g. `200 128 96:48` (default: full sweep)
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

from tpuvec.index import HnswParams, bruteforce_knn
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings
from tpuvec.utils.safecache import enable_atomic_cache_writes
from tpuvec.utils.transfer import prepare_vectors_device

enable_atomic_cache_writes()

N, D, QN, K, REPS = 100_000, 768, 256, 10, 5
MARGIN = 65_536  # measure marginal rate over the last rows (post-ramp)


def log(*a):
    print(*a, flush=True)


def parse_variant(s: str):
    if ":" in s:
        efc, it = s.split(":")
        return int(efc), int(it)
    return int(s), None


def main():
    variants = [parse_variant(a) for a in sys.argv[1:]] or [
        (200, None), (128, None), (96, None), (64, None),
        (200, 96), (128, 64), (96, 48),
    ]
    data = synthetic_embeddings(N + QN * (REPS + 1), D, seed=0)
    x, qpool = data[:N], data[N:]
    gt = None
    rows = []
    for efc, iters in variants:
        params = HnswParams(
            m=16, max_m0=32, ef_construction=efc, ef_search=128,
            build_max_iters=iters,
        )
        cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
        xp = prepare_vectors_device(cfg, x)
        t0 = time.time()
        state = build_graph(
            cfg, xp[: N - MARGIN],
            ids=np.arange(N - MARGIN, dtype=np.int32), max_batch=1024,
        )
        state.count.block_until_ready()
        t_ramp = time.time() - t0
        t1 = time.time()
        state = build_graph(
            cfg, xp[N - MARGIN :],
            ids=np.arange(N - MARGIN, N, dtype=np.int32), max_batch=1024,
            state=state, start_size=N - MARGIN,
        )
        state.count.block_until_ready()
        t_marg = time.time() - t1
        e2e = N / (t_ramp + t_marg)
        marg = MARGIN / t_marg
        qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
        if gt is None:
            gt = np.asarray(
                bruteforce_knn(
                    qp, xp, jnp.ones(N, bool), metric=cfg.graph_metric,
                    k=K, normalized=cfg.normalized,
                )[1]
            )
        rep_qs = [
            prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * QN : (i + 2) * QN]))
            for i in range(REPS)
        ]
        jax.block_until_ready(rep_qs)
        res = {}
        for ef in (24, 48):
            d_h, i_h = search_graph(cfg, state, qp, k=K, ef=ef)
            i_h.block_until_ready()
            t0 = time.time()
            outs = [
                search_graph(cfg, state, rq, k=K, ef=ef)[1] for rq in rep_qs
            ]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / REPS
            found = np.asarray(i_h)
            r = sum(
                len(set(found[b].tolist()) & set(gt[b].tolist()))
                for b in range(QN)
            ) / (QN * K)
            res[ef] = (r, QN / dt)
        rows.append((efc, iters, e2e, marg, res))
        log(
            f"efc={efc:4d} iters={iters if iters else 'def':>4}: "
            f"build {e2e:6.0f} vec/s e2e / {marg:6.0f} marginal | "
            f"ef=24: {res[24][0]:.4f} @ {res[24][1]:7.0f} QPS | "
            f"ef=48: {res[48][0]:.4f} @ {res[48][1]:7.0f} QPS"
        )
        del state, xp

    log("\nefc  iters  e2e     marginal  r@24    r@48")
    for efc, iters, e2e, marg, res in rows:
        log(
            f"{efc:4d} {iters if iters else 0:5d} {e2e:7.0f} {marg:8.0f}  "
            f"{res[24][0]:.4f}  {res[48][0]:.4f}"
        )


if __name__ == "__main__":
    main()
