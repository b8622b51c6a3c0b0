"""Bisect _reverse_pass: compile successive prefixes of the real pass
and time each, isolating which op the 295 ms (measured by
profile_connect.py at 1M x 768) actually lives in. Pieces benched in
isolation all cost ~0.1 ms, so the cost must come from how XLA fuses or
lowers the composition.
"""

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

from tpuvec.ops.sort import bitonic_smallest
from tpuvec.utils.safecache import enable_atomic_cache_writes

enable_atomic_cache_writes()

CAP, NB, M0, PROTECT = 1_000_000, 1024, 32, 16
KEEP = M0 - PROTECT
P_N = NB * M0
_INF = jnp.float32(jnp.inf)


def make_prefix(stage: str):
    @partial(jax.jit, donate_argnames=("adj", "adj_dist"))
    def fn(adj, adj_dist, new_ids, fwd_i, fwd_d):
        ok_new = new_ids >= 0
        s = fwd_i.reshape(P_N)
        u = jnp.repeat(new_ids, M0)
        d = fwd_d.reshape(P_N)
        ok = jnp.logical_and(
            jnp.logical_and(s >= 0, jnp.isfinite(d)), jnp.repeat(ok_new, M0)
        )
        big = jnp.int32(CAP + 1)
        s_key = jnp.where(ok, s, big)
        s_s, d_s, u_s = jax.lax.sort(
            (s_key, d, u), dimension=0, num_keys=2, is_stable=True
        )
        if stage == "sort":
            return adj, adj_dist, s_s.sum() + u_s.sum() + d_s.sum()

        iota = jnp.arange(P_N, dtype=jnp.int32)
        start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), s_s[1:] != s_s[:-1]]
        )
        fi = jax.lax.cummax(jnp.where(start, iota, 0))
        occ = iota - fi
        leader = jnp.logical_and(start, s_s < big)
        if stage == "leader":
            return adj, adj_dist, occ.sum() + leader.sum()

        pos = iota[:, None] + jnp.arange(KEEP)[None, :]
        win = jnp.minimum(pos, P_N - 1)
        win_same = jnp.logical_and(s_s[win] == s_s[:, None], pos < P_N)
        ent_d = jnp.where(win_same, d_s[win], _INF)
        ent_i = jnp.where(win_same, u_s[win], -1)
        if stage == "window":
            return adj, adj_dist, ent_d.sum() + ent_i.sum()

        rows_old = adj[jnp.minimum(s_s, CAP - 1)][:, PROTECT:]
        rowsd_old = adj_dist[jnp.minimum(s_s, CAP - 1)][:, PROTECT:]
        if stage == "gather":
            return adj, adj_dist, rows_old.sum() + rowsd_old.sum()

        cat_i = jnp.concatenate([rows_old, ent_i], axis=1)
        cat_d = jnp.concatenate([rowsd_old, ent_d], axis=1)
        new_rowsd, new_rows = bitonic_smallest(cat_d, cat_i, k=KEEP)
        new_rows = jnp.where(jnp.isfinite(new_rowsd), new_rows, -1)
        if stage == "merge":
            return adj, adj_dist, new_rows.sum() + new_rowsd.sum()

        tgt = jnp.where(leader, s_s, CAP)
        if stage == "scatter_uniq":
            # leaders are unique by construction (group firsts); give the
            # dropped rows distinct OOB targets so the whole index vector
            # is unique and XLA can emit a vectorized scatter
            iota_u = jnp.arange(P_N, dtype=jnp.int32)
            tgt_u = jnp.where(leader, s_s, CAP + iota_u)
            adj = adj.at[tgt_u, PROTECT:].set(
                new_rows, mode="drop", unique_indices=True
            )
            adj_dist = adj_dist.at[tgt_u, PROTECT:].set(
                new_rowsd, mode="drop", unique_indices=True
            )
            return adj, adj_dist, adj.sum() * 0.0
        if stage == "barrier":
            tgt, new_rows, new_rowsd = jax.lax.optimization_barrier(
                (tgt, new_rows, new_rowsd)
            )
        if stage == "scatter1":
            adj = adj.at[tgt, PROTECT:].set(new_rows, mode="drop")
            return adj, adj_dist, adj.sum() * 0.0
        if stage == "rewrite":
            # scatter-free: searchsorted over the sorted leader keys, then
            # a full-array select (adj is [CAP, M0]; rewrite costs one
            # linear pass of HBM traffic)
            iota_r = jnp.arange(CAP, dtype=jnp.int32)
            pos2 = jnp.searchsorted(s_s, iota_r)
            pos2 = jnp.minimum(pos2, P_N - 1)
            hit = s_s[pos2] == iota_r
            a2 = jnp.where(hit[:, None], new_rows[pos2], adj[:, PROTECT:])
            d2 = jnp.where(hit[:, None], new_rowsd[pos2], adj_dist[:, PROTECT:])
            adj = jnp.concatenate([adj[:, :PROTECT], a2], axis=1)
            adj_dist = jnp.concatenate([adj_dist[:, :PROTECT], d2], axis=1)
            return adj, adj_dist, adj.sum() * 0.0
        adj = adj.at[tgt, PROTECT:].set(new_rows, mode="drop")
        adj_dist = adj_dist.at[tgt, PROTECT:].set(new_rowsd, mode="drop")
        return adj, adj_dist, adj.sum() * 0.0

    return fn


def main():
    rng = np.random.default_rng(5)
    adj = jnp.asarray(rng.integers(-1, CAP, (CAP, M0), dtype=np.int32))
    adjd = jnp.asarray(rng.random((CAP, M0), dtype=np.float32))

    def mk():
        ids = jnp.asarray(rng.integers(0, CAP, NB, dtype=np.int32))
        fi = jnp.asarray(rng.integers(-1, CAP, (NB, M0), dtype=np.int32))
        fd = jnp.sort(jnp.asarray(rng.random((NB, M0), dtype=np.float32)))
        return ids, fi, fd

    data = [mk() for _ in range(9)]
    jax.block_until_ready(data)

    for stage in ("scatter_uniq", "full"):
        fn = make_prefix(stage)
        a, dd = jnp.array(adj), jnp.array(adjd)
        a, dd, _ = fn(a, dd, *data[-1])
        jax.block_until_ready(a)
        t0 = time.time()
        for i in range(8):
            a, dd, _ = fn(a, dd, *data[i])
        jax.block_until_ready(a)
        print(f"{stage:8s} {(time.time() - t0) / 8 * 1e3:8.2f} ms", flush=True)
        del a, dd


if __name__ == "__main__":
    main()
