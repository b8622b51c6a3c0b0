"""Split the build connect stage: forward heuristic_select vs the
reverse pass (sort + window merge + scatter).

round-4 follow-up to profile_candidates.py: with the candidates beam
budget understood, connect (~305 ms at 1M x 768, batch 1024) is the next
stage down. This times its two halves separately on the real 1M bench
checkpoint (re-connecting the last built rows with fresh candidate
lists, shapes identical to live inserts).

Usage: python scripts/profile_connect.py [n_reps]
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
from tpuvec.index.build import _reverse_pass, heuristic_select
from tpuvec.index.graph import GraphState, config_for
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
def _forward(config, state, new_ids, cand_d, cand_i):
    c = config
    self_hit = cand_i == new_ids[:, None]
    cand_d = jnp.where(self_hit, jnp.inf, cand_d)
    cand_i = jnp.where(self_hit, -1, cand_i)
    cw = min(cand_d.shape[1], 192)
    cvecs = state.vectors[jnp.maximum(cand_i[:, :cw], 0)]
    return heuristic_select(config, cand_d[:, :cw], cand_i[:, :cw], cvecs, c.max_m0)


@partial(jax.jit, static_argnames=("config",))
def _gather_only(config, state, cand_i):
    cw = min(cand_i.shape[1], 192)
    return state.vectors[jnp.maximum(cand_i[:, :cw], 0)].sum(axis=(1, 2))


@partial(jax.jit, static_argnames=("config",), donate_argnames=("adj0", "adj0d"))
def _reverse(config, adj0, adj0d, new_ids, fwd_i, fwd_d):
    c = config
    return _reverse_pass(
        adj0, adj0d, new_ids, fwd_i, fwd_d, new_ids >= 0,
        c.cap, c.max_m0, protect=min(c.m, c.max_m0 // 2),
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
    with open(CKPT + ".json") as f:
        pos = int(json.load(f)["pos"])
    cache = f"/tmp/tpuvec_data_{N + 256 * 6}x{D}_c1024_s0.npy"
    x = np.load(cache, mmap_mode="r")[:N]
    xp = prepare_vectors_device(cfg, x)
    z = np.load(CKPT)
    fields = {f: jnp.asarray(z[f]) for f in _CKPT_FIELDS}
    mask = (np.arange(N) < pos)[:, None]
    fields["vectors"] = jnp.where(jnp.asarray(mask), xp, 0)
    state = GraphState(**fields)
    print(f"resumed at {pos}/{N}", flush=True)

    rng = np.random.default_rng(7)
    c = 256  # candidate width out of the beam (efp)

    def fake_batch(i):
        ids = jnp.asarray(
            np.arange(pos - (i + 1) * BATCH, pos - i * BATCH, dtype=np.int32)
        )
        ci = jnp.asarray(
            rng.integers(0, pos, size=(BATCH, c), dtype=np.int32)
        )
        cd = jnp.sort(
            jnp.asarray(rng.random((BATCH, c), dtype=np.float32))
        )
        return ids, cd, ci

    batches = [fake_batch(i) for i in range(reps + 1)]
    jax.block_until_ready(batches)

    # warmups
    ids, cd, ci = batches[-1]
    fd, fi = _forward(cfg, state, ids, cd, ci)
    fi.block_until_ready()
    print("forward warm", flush=True)
    _gather_only(cfg, state, ci).block_until_ready()
    adj0 = jnp.array(state.adj0)
    adj0d = jnp.array(state.adj0_dist)
    adj0, adj0d = _reverse(cfg, adj0, adj0d, ids, fi, fd)
    adj0.block_until_ready()
    print("reverse warm", flush=True)

    t0 = time.time()
    outs = [_gather_only(cfg, state, b[2]) for b in batches[:reps]]
    jax.block_until_ready(outs)
    print(f"cvec gather only: {(time.time() - t0) / reps * 1e3:8.1f} ms",
          flush=True)

    t0 = time.time()
    fouts = [
        _forward(cfg, state, b[0], b[1], b[2]) for b in batches[:reps]
    ]
    jax.block_until_ready(fouts)
    print(f"forward select:   {(time.time() - t0) / reps * 1e3:8.1f} ms",
          flush=True)

    t0 = time.time()
    for i in range(reps):
        ids = batches[i][0]
        fd, fi = fouts[i]
        adj0, adj0d = _reverse(cfg, adj0, adj0d, ids, fi, fd)
    adj0.block_until_ready()
    print(f"reverse pass:     {(time.time() - t0) / reps * 1e3:8.1f} ms",
          flush=True)


def pieces():
    """Time the individual _reverse_pass pieces at the real shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    cap, nb, m0, keep = 1_000_000, 1024, 32, 16
    p_n = nb * m0
    rng = np.random.default_rng(3)
    adj = jnp.asarray(rng.integers(-1, cap, (cap, m0), dtype=np.int32))
    adjd = jnp.asarray(rng.random((cap, m0), dtype=np.float32))

    def mk(i):
        s = jnp.asarray(rng.integers(0, cap, p_n, dtype=np.int32))
        d = jnp.asarray(rng.random(p_n, dtype=np.float32))
        u = jnp.asarray(rng.integers(0, cap, p_n, dtype=np.int32))
        rows = jnp.asarray(rng.integers(-1, cap, (p_n, keep), dtype=np.int32))
        rowsd = jnp.asarray(rng.random((p_n, keep), dtype=np.float32))
        return s, d, u, rows, rowsd

    data = [mk(i) for i in range(9)]
    jax.block_until_ready(data)

    @jax.jit
    def p_sort(s, d, u):
        return jax.lax.sort((s, d, u), dimension=0, num_keys=2, is_stable=True)

    @jax.jit
    def p_gather(s, adj):
        return adj[jnp.minimum(s, cap - 1)].sum()

    @jax.jit
    def p_scatter(adj, adjd, s, rows, rowsd):
        # leader-style scatter: ~1/m0 of entries unique, rest dropped
        tgt = jnp.where(s % m0 == 0, s, cap)
        adj = adj.at[tgt, keep:].set(rows[:, :m0 - keep], mode="drop")
        adjd = adjd.at[tgt, keep:].set(rowsd[:, :m0 - keep], mode="drop")
        return adj, adjd

    @jax.jit
    def p_scatter_u(adj, adjd, s, rows, rowsd):
        iota = jnp.arange(p_n, dtype=jnp.int32)
        tgt = jnp.where(s % m0 == 0, s, cap + iota)
        adj = adj.at[tgt, keep:].set(
            rows[:, :m0 - keep], mode="drop", unique_indices=True
        )
        adjd = adjd.at[tgt, keep:].set(
            rowsd[:, :m0 - keep], mode="drop", unique_indices=True
        )
        return adj, adjd

    @jax.jit
    def p_rewrite(adj, adjd, s, rows, rowsd):
        # gather-formulated: searchsorted over sorted leader keys, then a
        # full-array select (scatter-free)
        lead = s % m0 == 0
        key = jnp.sort(jnp.where(lead, s, cap + 1))
        iota_r = jnp.arange(cap, dtype=jnp.int32)
        pos = jnp.searchsorted(key, iota_r)
        hit = key[jnp.minimum(pos, p_n - 1)] == iota_r
        src = jnp.minimum(pos, p_n - 1)
        newr = rows[src, : m0 - keep]
        newd = rowsd[src, : m0 - keep]
        a2 = jnp.where(hit[:, None], newr, adj[:, keep:])
        d2 = jnp.where(hit[:, None], newd, adjd[:, keep:])
        return (
            jnp.concatenate([adj[:, :keep], a2], axis=1),
            jnp.concatenate([adjd[:, :keep], d2], axis=1),
        )

    @jax.jit
    def p_bitonic(rowsd, rows):
        from tpuvec.ops.sort import bitonic_smallest
        cat = jnp.concatenate([rows, rows], axis=1)
        catd = jnp.concatenate([rowsd, rowsd], axis=1)
        return bitonic_smallest(catd, cat, k=keep)

    for name, fn, args in (
        ("sort 32K multikey", p_sort, lambda t: t[:3]),
        ("row gather 32K", p_gather, lambda t: (t[0], adj)),
        ("scatter 2x", p_scatter, lambda t: (adj, adjd, t[0], t[3], t[4])),
        ("scatter 2x uniq", p_scatter_u, lambda t: (adj, adjd, t[0], t[3], t[4])),
        ("full rewrite", p_rewrite, lambda t: (adj, adjd, t[0], t[3], t[4])),
        ("bitonic 32Kx32", p_bitonic, lambda t: (t[4], t[3])),
    ):
        jax.block_until_ready(fn(*args(data[-1])))
        t0 = time.time()
        outs = [fn(*args(data[i])) for i in range(8)]
        jax.block_until_ready(outs)
        print(f"{name:18s} {(time.time() - t0) / 8 * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--pieces":
        pieces()
    else:
        main()
