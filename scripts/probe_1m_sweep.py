"""Sweep (ef, max_iters, n_expand) on the bench's saved 1M checkpoint.

Reuses /tmp/tpuvec_bench_1000000x768.npz (bench.py --build-worker output)
so no rebuild is needed. Finds the best QPS point with recall@10 >= 0.95
to encode into bench.py's sweep list.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (the bench module doubles as the config source)

jax = bench._jax_setup()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpuvec.index import bruteforce_knn  # noqa: E402
from tpuvec.index.graph import prepare_vectors  # noqa: E402
from tpuvec.index.search import search_graph  # noqa: E402
from tpuvec.utils.transfer import prepare_vectors_device  # noqa: E402


def main():
    cfg = bench._config()
    x, qpool = bench._dataset()
    xp_dev = prepare_vectors_device(cfg, x)
    state, pos, _ = bench._restore_state(cfg, xp_dev, jnp)
    assert state is not None and pos == bench.N, "run bench.py first"
    qn, k = bench.QN, bench.K

    qp = prepare_vectors(cfg, jnp.asarray(qpool[:qn]))
    _, gt_i = bruteforce_knn(
        qp, xp_dev, jnp.ones(bench.N, bool), metric=cfg.graph_metric, k=k,
        normalized=cfg.normalized,
    )
    gt = np.asarray(gt_i)
    del xp_dev
    reps = 5
    rep_qs = [
        prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * qn : (i + 2) * qn]))
        for i in range(reps)
    ]
    jax.block_until_ready(rep_qs)

    for ef, iters, e in [
        (48, None, 1),
        (48, 64, 1),
        (48, 56, 1),
        (64, 64, 1),
        (64, 80, 1),
        (32, 72, 1),
        (32, 96, 1),
        (48, None, 2),
        (48, 32, 2),
        (96, 64, 1),
    ]:
        d_h, i_h = search_graph(
            cfg, state, qp, k=k, ef=ef, max_iters=iters, n_expand=e
        )
        i_h.block_until_ready()
        t0 = time.time()
        outs = [
            search_graph(
                cfg, state, rep_qs[i], k=k, ef=ef, max_iters=iters, n_expand=e
            )[1]
            for i in range(reps)
        ]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / reps
        found = np.asarray(i_h)
        hits = sum(
            len(set(found[b].tolist()) & set(gt[b].tolist())) for b in range(qn)
        )
        print(
            f"ef={ef:3d} iters={iters if iters else 'def':>4} E={e} "
            f"recall={hits / (qn * k):.4f} {dt * 1e3:7.2f} ms "
            f"{qn / dt:9.0f} QPS",
            flush=True,
        )


if __name__ == "__main__":
    main()
