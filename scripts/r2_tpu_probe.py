"""Round-2 TPU probes: (a) XLA vs Pallas beam path QPS, (b) connect-stage
breakdown, (c) candidate max_iters sweep with end-to-end recall.

ONE TPU process at a time. Graph is cached to /tmp/r2_graph100k.npz so the
build cost is paid once across reruns.

Usage: python scripts/r2_tpu_probe.py [search|build|recall|all]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpuvec.index import HnswParams, bruteforce_knn
from tpuvec.index.build import build_graph
from tpuvec.index.graph import GraphState, config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings

N, D, QN, K = 100_000, 768, 256, 10
CACHE = "/tmp/r2_graph100k.npz"
_FIELDS = [
    "vectors", "adj0", "adj0_dist", "levels", "upper_slot", "upper_nodes",
    "upper_adj", "upper_dist", "entry_point", "entry_level", "count",
    "upper_count",
]


def log(*a):
    print(*a, flush=True)


def get_cfg():
    params = HnswParams(m=32, max_m0=64, ef_construction=200, ef_search=128)
    return config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)


def get_data():
    reps = 6
    data = synthetic_embeddings(N + QN * (reps + 1), D, seed=0)
    return data[:N], data[N:]


def get_state(cfg, x):
    from tpuvec.utils.transfer import prepare_vectors_device

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        state = GraphState(**{f: jnp.asarray(z[f]) for f in _FIELDS})
        log(f"loaded cached graph ({int(state.count)} nodes)")
        return state
    xp = prepare_vectors_device(cfg, x)
    t0 = time.time()
    state = build_graph(cfg, xp, max_batch=1024, progress=16)
    state.count.block_until_ready()
    log(f"build: {N / (time.time() - t0):.0f} vec/s")
    np.savez(CACHE, **{f: np.asarray(getattr(state, f)) for f in _FIELDS})
    return state


def probe_search(cfg, state, x, qpool):
    qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
    gt_d, gt_i = bruteforce_knn(
        qp, prepare_vectors(cfg, jnp.asarray(x)), jnp.ones(N, bool),
        metric=cfg.graph_metric, k=K, normalized=cfg.normalized,
    )
    gt = np.asarray(gt_i)
    reps = 5
    rep_qs = [
        prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * QN : (i + 2) * QN]))
        for i in range(reps)
    ]
    jax.block_until_ready(rep_qs)

    def recall(found):
        hits = sum(
            len(set(found[b].tolist()) & set(gt[b].tolist())) for b in range(QN)
        )
        return hits / (QN * K)

    for use_pallas, n_expand in (
        (False, 1), (False, 2), (False, 4), (True, 2), (True, 4),
    ):
        tag = ("pallas" if use_pallas else "xla   ") + f" E={n_expand}"
        for ef in (16, 32, 64, 128):
            try:
                d_h, i_h = search_graph(
                    cfg, state, qp, k=K, ef=ef,
                    use_pallas=use_pallas, n_expand=n_expand,
                )
                i_h.block_until_ready()
            except Exception as e:  # Mosaic compile failure etc.
                log(f"{tag} ef={ef:4d} FAILED: {type(e).__name__}: {str(e)[:200]}")
                break
            t0 = time.time()
            outs = [
                search_graph(
                    cfg, state, rep_qs[i], k=K, ef=ef,
                    use_pallas=use_pallas, n_expand=n_expand,
                )[1]
                for i in range(reps)
            ]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / reps
            log(
                f"{tag} ef={ef:4d} recall={recall(np.asarray(i_h)):.4f} "
                f"{dt * 1e3:7.2f} ms/batch {QN / dt:9.0f} QPS"
            )


def probe_build(cfg, state, x):
    """Connect-stage breakdown at nb=1024 on a warm 100K graph."""
    from tpuvec.index.build import (
        _pairwise_cands, _reverse_pass, _stage_candidates, heuristic_select,
    )

    nb = 1024
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, N, nb), dtype=jnp.int32)
    vecs = prepare_vectors(cfg, jnp.asarray(x[np.asarray(ids)]))

    def timeit(name, fn, *args, reps=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        log(f"{name:46s} {(time.time() - t0) / reps * 1e3:9.2f} ms")
        return out

    # NOTE: same-input rep timing is unreliable for simple ops (result
    # cache) but these are large compound programs where it was measured
    # not to trigger; still, treat small numbers with suspicion.
    cand_d, cand_i = timeit(
        "stage_candidates (efc=200, E=2)", _stage_candidates, cfg, state, vecs
    )
    cw = min(cand_d.shape[1], 192)
    cvecs = state.vectors[jnp.maximum(cand_i[:, :cw], 0)]

    timeit(
        "heuristic_select [1024,192]",
        jax.jit(lambda d, i, v: heuristic_select(cfg, d, i, v, cfg.max_m0)),
        cand_d[:, :cw], cand_i[:, :cw], cvecs,
    )
    timeit(
        "pairwise_cands only",
        jax.jit(lambda v: _pairwise_cands(cfg, v)), cvecs,
    )
    fwd_d, fwd_i = heuristic_select(cfg, cand_d[:, :cw], cand_i[:, :cw], cvecs, cfg.max_m0)
    ok = ids >= 0
    timeit(
        "reverse_pass [1024x64]",
        jax.jit(
            lambda a, ad, ni, fi, fd, okk: _reverse_pass(
                a, ad, ni, fi, fd, okk, cfg.cap, cfg.max_m0,
                protect=min(cfg.m, cfg.max_m0 // 2),
            )
        ),
        state.adj0, state.adj0_dist, ids, fwd_i, fwd_d, ok,
    )


def probe_recall_iters(base_cfg, x, qpool):
    """Build with reduced candidate iterations / efc; measure end recall."""
    import dataclasses

    import tpuvec.index.build as B
    from tpuvec.utils.transfer import prepare_vectors_device

    qp = None
    gt = None

    for efc, frac in (
        (200, 1.0), (200, 0.63), (200, 0.47), (128, 1.0), (128, 0.7),
    ):
        cfg = dataclasses.replace(base_cfg, ef_construction=efc)
        orig = B.default_max_iters
        if frac < 1.0:
            B.default_max_iters = lambda ef, e, _o=orig, _f=frac: max(
                int(_o(ef, e) * _f), 16
            )
        try:
            xp = prepare_vectors_device(cfg, x)
            t0 = time.time()
            state = build_graph(cfg, xp, max_batch=1024)
            state.count.block_until_ready()
            rate = N / (time.time() - t0)
            if qp is None:
                qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
                _, gt_i = bruteforce_knn(
                    qp, xp, jnp.ones(N, bool), metric=cfg.graph_metric,
                    k=K, normalized=cfg.normalized,
                )
                gt = np.asarray(gt_i)
            for ef in (16, 48):
                _, i_h = search_graph(cfg, state, qp, k=K, ef=ef)
                found = np.asarray(i_h)
                hits = sum(
                    len(set(found[b].tolist()) & set(gt[b].tolist()))
                    for b in range(QN)
                )
                log(
                    f"efc={efc} iters_frac={frac} build={rate:.0f} vec/s "
                    f"ef={ef} recall={hits / (QN * K):.4f}"
                )
            del state, xp
        finally:
            B.default_max_iters = orig


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices: {jax.devices()}")
    cfg = get_cfg()
    x, qpool = get_data()
    if what in ("search", "build", "all"):
        state = get_state(cfg, x)
        if what in ("search", "all"):
            probe_search(cfg, state, x, qpool)
        if what in ("build", "all"):
            probe_build(cfg, state, x)
        del state
    if what in ("recall", "all"):
        probe_recall_iters(cfg, x, qpool)


if __name__ == "__main__":
    main()
