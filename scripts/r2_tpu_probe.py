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

    for use_pallas, n_expand in ((False, 1), (True, 1), (True, 2)):
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


def probe_ablate(cfg, state, x, qpool):
    """Attribute per-iteration beam cost: run a fixed-trip while_loop with
    components progressively enabled, at bench shapes (B=256, ef=16)."""
    from functools import partial

    from tpuvec.index.search import (
        _chunked_membership, _node_dist, descend_to_level1,
    )
    from tpuvec.ops.sort import bitonic_topk_merge_sorted, rank_topk_merge_sorted

    b, ef, iters = QN, 16, 32
    qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
    seed_ids, seed_d = descend_to_level1(cfg, state, qp)

    @partial(jax.jit, static_argnames=("mode",))
    def run(state, q, seeds, seed_d, *, mode):
        beam_d = jnp.full((b, ef), jnp.inf, jnp.float32).at[:, 0].set(seed_d)
        beam_i = jnp.full((b, ef), -1, jnp.int32).at[:, 0].set(seeds)
        beam_x = jnp.zeros((b, ef), jnp.bool_)

        def body(it, carry):
            beam_d, beam_i, beam_x = carry
            if mode == 5:
                # varied gather addresses WITHOUT any merge: isolates the
                # random-row HBM gather cost from the bookkeeping cost
                cand = (it * 9973 + jnp.arange(b, dtype=jnp.int32) * 131) % N
                nbrs = state.adj0[cand]
                nd = _node_dist(cfg, state, q, nbrs)
                beam_d = beam_d + nd[:, :ef] * 1e-20
                return beam_d, beam_i, beam_x
            # frontier = first unexpanded
            if mode >= 3 or mode == 4:
                unexp = jnp.logical_and(
                    jnp.logical_not(beam_x), jnp.isfinite(beam_d)
                )
                pos = jnp.argmax(unexp, axis=1)
                cand = jnp.take_along_axis(beam_i, pos[:, None], 1)[:, 0]
                beam_x = beam_x.at[
                    jnp.arange(b), pos
                ].set(True)
            else:
                cand = beam_i[:, 0]
            nbrs = state.adj0[jnp.maximum(cand, 0)]
            nd = _node_dist(cfg, state, q, nbrs)
            ni = nbrs
            if mode >= 2 or mode == 4:
                dup = _chunked_membership(nbrs, beam_i)
                nd = jnp.where(dup, jnp.inf, nd)
                ni = jnp.where(dup, -1, nbrs)
            if mode == 4:
                beam_d, beam_i, beam_x = rank_topk_merge_sorted(
                    beam_d, beam_i, beam_x, nd, ni
                )
            elif mode >= 1:
                beam_d, beam_i, beam_x = bitonic_topk_merge_sorted(
                    beam_d, beam_i, beam_x, nd, ni
                )
            else:
                beam_d = beam_d + nd[:, :ef] * 1e-20  # consume
            return beam_d, beam_i, beam_x

        out = jax.lax.fori_loop(0, iters, body, (beam_d, beam_i, beam_x))
        return out[0]

    names = {
        0: "gather+dist only",
        1: "+ bitonic merge",
        2: "+ dedup sweep",
        3: "+ frontier select",
        4: "rank merge (full)",
        5: "varied-addr gather only",
    }
    reps = 10
    rep_qs = [
        prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * QN : (i + 2) * QN]))
        for i in range(5)
    ]
    for mode in (0, 5, 1, 4):
        out = run(state, qp, seed_ids, seed_d, mode=mode)
        out.block_until_ready()
        t0 = time.time()
        outs = [
            run(state, rep_qs[i % 5], seed_ids, seed_d, mode=mode)
            for i in range(reps)
        ]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        log(
            f"ablate {names[mode]:22s} {dt * 1e3:7.2f} ms "
            f"({dt / iters * 1e6:6.1f} us/iter)"
        )


def probe_bf16(cfg, state, x, qpool):
    """Search with the index copy downcast to bf16: halves the dominant
    random-row HBM gather traffic; measures the recall cost directly."""
    import dataclasses

    st2 = dataclasses.replace(
        state, vectors=state.vectors.astype(jnp.bfloat16)
    )
    qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
    _, gt_i = bruteforce_knn(
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
    for ef in (16, 32, 64):
        d_h, i_h = search_graph(cfg, st2, qp, k=K, ef=ef)
        i_h.block_until_ready()
        t0 = time.time()
        outs = [
            search_graph(cfg, st2, rep_qs[i], k=K, ef=ef)[1]
            for i in range(reps)
        ]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        found = np.asarray(i_h)
        hits = sum(
            len(set(found[b].tolist()) & set(gt[b].tolist())) for b in range(QN)
        )
        log(
            f"bf16   ef={ef:4d} recall={hits / (QN * K):.4f} "
            f"{dt * 1e3:7.2f} ms/batch {QN / dt:9.0f} QPS"
        )


def probe_degree(base_cfg, x, qpool):
    """Search QPS is bound by gathered-row count (B x M0 rows/iter at
    ~16 ns/row): build graphs at smaller M0 and measure recall/QPS/build
    rate. hnswlib's defaults are m=16, M0=32 — the reference's 32/64 was
    tuned for CPU cache lines, not a TPU gather engine."""
    from tpuvec.utils.transfer import prepare_vectors_device

    qp = None
    gt = None
    reps = 5
    for m, m0, efc in ((16, 32, 128), (16, 32, 200), (12, 24, 128)):
        params = HnswParams(m=m, max_m0=m0, ef_construction=efc, ef_search=128)
        cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
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
            rep_qs = [
                prepare_vectors(
                    cfg, jnp.asarray(qpool[(i + 1) * QN : (i + 2) * QN])
                )
                for i in range(reps)
            ]
            jax.block_until_ready(rep_qs)
        del xp
        for ef in (16, 24, 32, 48, 64):
            d_h, i_h = search_graph(cfg, state, qp, k=K, ef=ef)
            i_h.block_until_ready()
            t0 = time.time()
            outs = [
                search_graph(cfg, state, rep_qs[i], k=K, ef=ef)[1]
                for i in range(reps)
            ]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / reps
            found = np.asarray(i_h)
            hits = sum(
                len(set(found[b].tolist()) & set(gt[b].tolist()))
                for b in range(QN)
            )
            log(
                f"m={m}/{m0} efc={efc} build={rate:.0f}v/s ef={ef:3d} "
                f"recall={hits / (QN * K):.4f} {dt * 1e3:7.2f} ms "
                f"{QN / dt:9.0f} QPS"
            )
        del state


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
    if what == "degree":
        probe_degree(cfg, x, qpool)
    if what in ("search", "build", "ablate", "trace", "bf16", "all"):
        state = get_state(cfg, x)
        if what in ("search", "all"):
            probe_search(cfg, state, x, qpool)
        if what in ("ablate", "all"):
            probe_ablate(cfg, state, x, qpool)
        if what == "bf16":
            probe_bf16(cfg, state, x, qpool)
        if what == "trace":
            probe_trace(cfg, state, x, qpool)
        if what in ("build", "all"):
            probe_build(cfg, state, x)
        del state
    if what in ("recall", "all"):
        probe_recall_iters(cfg, x, qpool)


def probe_trace(cfg, state, x, qpool):
    """Capture a profiler trace of 3 search batches at ef=16."""
    qp = prepare_vectors(cfg, jnp.asarray(qpool[:QN]))
    rep_qs = [
        prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * QN : (i + 2) * QN]))
        for i in range(3)
    ]
    jax.block_until_ready(rep_qs)
    out = search_graph(cfg, state, qp, k=K, ef=16)
    jax.block_until_ready(out)
    jax.profiler.start_trace("/tmp/tpuvec_trace")
    outs = [search_graph(cfg, state, rep_qs[i], k=K, ef=16)[1] for i in range(3)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    log("trace written to /tmp/tpuvec_trace")


if __name__ == "__main__":
    main()
