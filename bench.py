"""tpuvec benchmark — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): QPS/chip at recall@10 >= 0.95.
Workload: the reference's 100K x 768D cosine ef-sweep config
(BASELINE.md config 2; reference claims 2-5 ms/query k=10 at this scale,
CHANGELOG.md:92-96 — we take the stated-requirement 2.8 ms/query ≈ 357 QPS
as the single-core baseline, examples/performance_report.rs:247-250).

Environment knobs:
  TPUVEC_BENCH_N       corpus size (default 100_000)
  TPUVEC_BENCH_D       dimensions (default 768)
  TPUVEC_BENCH_Q       query batch (default 256)

Side info (build rate, sweep table) goes to stderr; stdout carries exactly
the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpuvec.index import HnswParams, bruteforce_knn
    from tpuvec.index.build import build_graph
    from tpuvec.index.graph import config_for, prepare_vectors
    from tpuvec.index.search import search_graph
    from tpuvec.types import DistanceMetric

    n = int(os.environ.get("TPUVEC_BENCH_N", 100_000))
    d = int(os.environ.get("TPUVEC_BENCH_D", 768))
    qn = int(os.environ.get("TPUVEC_BENCH_Q", 256))
    k = 10
    baseline_qps = 357.0  # reference ~2.8 ms/query (see module docstring)

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"corpus {n} x {d} f32 cosine, k={k}, query batch {qn}")

    from tpuvec.utils.data import synthetic_embeddings

    reps = 5
    data = synthetic_embeddings(n + qn * (reps + 1), d, seed=0)
    x, q = data[:n], data[n : n + qn]

    params = HnswParams(m=32, max_m0=64, ef_construction=200, ef_search=128)
    cfg = config_for(
        d, metric=DistanceMetric.COSINE, params=params, cap=n
    )
    from tpuvec.utils.transfer import prepare_vectors_device

    xp_dev = prepare_vectors_device(cfg, x)

    t0 = time.time()
    state = build_graph(cfg, xp_dev, max_batch=1024)
    state.count.block_until_ready()
    build_s = time.time() - t0
    log(f"build: {n} vectors in {build_s:.1f}s = {n / build_s:.0f} vec/s")

    qp = prepare_vectors(cfg, jnp.asarray(q))
    gt_d, gt_i = bruteforce_knn(
        qp, xp_dev, jnp.ones(n, bool), metric=cfg.graph_metric, k=k,
        normalized=cfg.normalized,
    )
    del xp_dev
    gt = np.asarray(gt_i)

    def recall(found):
        hits = sum(
            len(set(found[b].tolist()) & set(gt[b].tolist())) for b in range(qn)
        )
        return hits / (qn * k)

    # distinct query batches per rep: defeats any same-input result caching
    rep_qs = [
        prepare_vectors(cfg, jnp.asarray(data[n + (i + 1) * qn : n + (i + 2) * qn]))
        for i in range(reps)
    ]
    import jax as _jax

    _jax.block_until_ready(rep_qs)

    best = None
    for ef, n_expand in [(16, 1), (24, 1), (32, 1), (48, 1), (64, 1), (96, 1), (128, 1)]:
        d_h, i_h = search_graph(cfg, state, qp, k=k, ef=ef, n_expand=n_expand)
        i_h.block_until_ready()  # compile
        t0 = time.time()
        outs = []
        for i in range(reps):
            outs.append(search_graph(cfg, state, rep_qs[i], k=k, ef=ef, n_expand=n_expand)[1])
        _jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        qps = qn / dt
        r = recall(np.asarray(i_h))
        log(f"ef={ef:4d} E={n_expand} recall@10={r:.4f} {dt * 1e3:7.2f} ms/batch {qps:9.0f} QPS")
        if r >= 0.95 and (best is None or qps > best[0]):
            best = (qps, r, ef)

    if best is None:
        log("WARNING: no ef reached recall 0.95; reporting highest-recall point")
        d_h, i_h = search_graph(cfg, state, qp, k=k, ef=256, n_expand=1)
        i_h.block_until_ready()
        t0 = time.time()
        outs = [search_graph(cfg, state, rep_qs[i % reps], k=k, ef=256, n_expand=1)[1] for i in range(3)]
        _jax.block_until_ready(outs)
        qps = qn / ((time.time() - t0) / 3)
        best = (qps, recall(np.asarray(i_h)), 256)

    qps, r, ef = best
    print(
        json.dumps(
            {
                "metric": f"QPS/chip at recall@10>={r:.3f} ({n}x{d} f32 cosine, ef={ef}); build {n / build_s:.0f} vec/s",
                "value": round(qps, 1),
                "unit": "QPS",
                "vs_baseline": round(qps / baseline_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
