"""Split the build candidates stage into descent vs level-0 beam cost.

round-3 profile (1M x 768, batch 1024): candidates 466 ms was the
largest stage after the upper-pool compaction, but capping the beam's
iteration budget did NOT change the build rate (ROUND_NOTES round 3) —
so the cost must sit in the upper-level greedy descent or in fixed
per-program overhead, not the beam loop. This times the two halves of
_stage_candidates separately against the real 1M bench checkpoint.

Usage: python scripts/profile_candidates.py [n_reps]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tpuvec.index import HnswParams
from tpuvec.index.graph import GraphState, config_for
from tpuvec.index.search import (
    beam_search_level0,
    default_max_iters,
    descend_to_level1,
)
from tpuvec.types import DistanceMetric
from tpuvec.utils.safecache import enable_atomic_cache_writes
from tpuvec.utils.transfer import prepare_vectors_device

enable_atomic_cache_writes()

N, D, BATCH = 1_000_000, 768, 1024
CKPT = f"/tmp/tpuvec_bench_{N}x{D}.npz"
_CKPT_FIELDS = [
    "adj0", "adj0_dist", "levels", "upper_slot", "upper_nodes",
    "upper_adj", "upper_dist", "entry_point", "entry_level", "count",
    "upper_count",
]


@partial(jax.jit, static_argnames=("config",))
def _descend(config, state, q):
    return descend_to_level1(config, state, q)


@partial(jax.jit, static_argnames=("config", "max_iters", "merge"))
def _beam(config, state, q, seed_ids, seed_d, max_iters, merge="rank"):
    c = config
    efc = max(c.ef_construction, c.max_m0)
    return beam_search_level0(
        config, state, q, seed_ids, seed_d,
        ef=efc, max_iters=max_iters, n_expand=2, merge=merge,
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
    with open(CKPT + ".json") as f:
        pos = int(json.load(f)["pos"])
    n_clusters = 1024
    cache = f"/tmp/tpuvec_data_{N + 256 * 6}x{D}_c{n_clusters}_s0.npy"
    x = np.load(cache, mmap_mode="r")[:N]
    xp = prepare_vectors_device(cfg, x)
    z = np.load(CKPT)
    fields = {f: jnp.asarray(z[f]) for f in _CKPT_FIELDS}
    mask = (np.arange(N) < pos)[:, None]
    fields["vectors"] = jnp.where(jnp.asarray(mask), xp, 0)
    state = GraphState(**fields)
    print(f"resumed at {pos}/{N}, entry_level={int(state.entry_level)}",
          flush=True)

    mi = default_max_iters(max(cfg.ef_construction, cfg.max_m0), 2)
    print(f"default beam max_iters={mi}", flush=True)

    # distinct inputs per rep (result cache, CLAUDE.md)
    batches = [
        xp[pos - (i + 1) * BATCH : pos - i * BATCH] for i in range(reps + 1)
    ]

    # --- warmup (first program execution costs minutes on the relay) ---
    sid, sd = _descend(cfg, state, batches[-1])
    sid.block_until_ready()
    print("descend warm", flush=True)
    bd, bi, it = _beam(cfg, state, batches[-1], sid, sd, mi)
    bi.block_until_ready()
    print(f"beam warm (iters={int(it)})", flush=True)

    # --- descent ---
    t0 = time.time()
    outs = [_descend(cfg, state, batches[i]) for i in range(reps)]
    jax.block_until_ready(outs)
    t_desc = (time.time() - t0) / reps
    print(f"descend: {t_desc * 1e3:8.1f} ms/batch", flush=True)

    # --- beam at several iteration budgets x merge impls ---
    ref_ids = None
    for merge in ("rank", "bitonic"):
        for cap in (mi, 96):
            d_w, i_w, _ = _beam(
                cfg, state, batches[-1], sid, sd, cap, merge
            )
            i_w.block_until_ready()
            if cap == mi:
                if ref_ids is None:
                    ref_ids = np.asarray(i_w)
                else:
                    agree = np.mean(
                        [
                            len(set(a.tolist()) & set(b.tolist())) / len(a)
                            for a, b in zip(ref_ids, np.asarray(i_w))
                        ]
                    )
                    print(f"  [{merge}] id-set agreement vs rank: {agree:.4f}",
                          flush=True)
            t0 = time.time()
            its = []
            for i in range(reps):
                s_i, s_d = outs[i]
                d_, i_, it_ = _beam(
                    cfg, state, batches[i], s_i, s_d, cap, merge
                )
                its.append(it_)
            jax.block_until_ready(its)
            t_b = (time.time() - t0) / reps
            print(
                f"beam({merge:7s}, max_iters={cap:3d}): {t_b * 1e3:8.1f} "
                f"ms/batch (iters used: {[int(v) for v in its[:2]]})",
                flush=True,
            )


if __name__ == "__main__":
    main()
