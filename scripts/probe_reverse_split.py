"""Validate the two-program reverse pass: compute (reads adj) then
scatter (writes adj) as SEPARATE jit programs.

Evidence trail (scripts/profile_reverse_bisect.py, probe_scatter.py):
- raw 31K-row scatters into donated [1M, 32] arrays: 0.07 ms
- the same scatter inside the full reverse-pass program: ~140 ms each
- an optimization_barrier before the scatter does not fix it
=> XLA deoptimizes a program that both gathers from and scatters into
   the same buffer. A program boundary forces materialization of the
   update rows and lets the scatter compile to its fast form.
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


@jax.jit
def rev_compute(adj, adj_dist, new_ids, fwd_i, fwd_d):
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
    iota = jnp.arange(P_N, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), jnp.bool_), s_s[1:] != s_s[:-1]])
    leader = jnp.logical_and(start, s_s < big)
    pos = iota[:, None] + jnp.arange(KEEP)[None, :]
    win = jnp.minimum(pos, P_N - 1)
    win_same = jnp.logical_and(s_s[win] == s_s[:, None], pos < P_N)
    ent_d = jnp.where(win_same, d_s[win], _INF)
    ent_i = jnp.where(win_same, u_s[win], -1)
    rows_old = adj[jnp.minimum(s_s, CAP - 1)][:, PROTECT:]
    rowsd_old = adj_dist[jnp.minimum(s_s, CAP - 1)][:, PROTECT:]
    cat_i = jnp.concatenate([rows_old, ent_i], axis=1)
    cat_d = jnp.concatenate([rowsd_old, ent_d], axis=1)
    new_rowsd, new_rows = bitonic_smallest(cat_d, cat_i, k=KEEP)
    new_rows = jnp.where(jnp.isfinite(new_rowsd), new_rows, -1)
    tgt = jnp.where(leader, s_s, CAP)
    return tgt, new_rows, new_rowsd


@partial(jax.jit, donate_argnames=("adj", "adj_dist"))
def rev_apply(adj, adj_dist, tgt, new_rows, new_rowsd):
    adj = adj.at[tgt, PROTECT:].set(new_rows, mode="drop")
    adj_dist = adj_dist.at[tgt, PROTECT:].set(new_rowsd, mode="drop")
    return adj, adj_dist


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

    a, dd = jnp.array(adj), jnp.array(adjd)
    t, r, rd = rev_compute(a, dd, *data[-1])
    jax.block_until_ready((t, r, rd))

    # compute program alone
    t0 = time.time()
    outs = [rev_compute(a, dd, *data[i]) for i in range(8)]
    jax.block_until_ready(outs)
    print(f"rev_compute only:  {(time.time() - t0) / 8 * 1e3:8.2f} ms",
          flush=True)

    # apply program alone (pre-materialized updates)
    a2, dd2 = jnp.array(adj), jnp.array(adjd)
    a2, dd2 = rev_apply(a2, dd2, *outs[-1])
    jax.block_until_ready((a2, dd2))
    t0 = time.time()
    for i in range(8):
        a2, dd2 = rev_apply(a2, dd2, *outs[i])
    jax.block_until_ready((a2, dd2))
    print(f"rev_apply only:    {(time.time() - t0) / 8 * 1e3:8.2f} ms",
          flush=True)

    # chained
    t, r, rd = rev_compute(a, dd, *data[-1])
    a, dd = rev_apply(a, dd, t, r, rd)
    jax.block_until_ready((a, dd))
    t0 = time.time()
    for i in range(8):
        t, r, rd = rev_compute(a, dd, *data[i])
        a, dd = rev_apply(a, dd, t, r, rd)
    jax.block_until_ready((a, dd))
    print(f"two-program chain: {(time.time() - t0) / 8 * 1e3:8.2f} ms",
          flush=True)





def variants():
    """Same rev_apply, inputs prepared three ways: straight from
    rev_compute, host-round-tripped, and jit-copied."""
    rng = np.random.default_rng(5)
    adj = jnp.asarray(rng.integers(-1, CAP, (CAP, M0), dtype=np.int32))
    adjd = jnp.asarray(rng.random((CAP, M0), dtype=np.float32))

    def mk():
        ids = jnp.asarray(rng.integers(0, CAP, NB, dtype=np.int32))
        fi = jnp.asarray(rng.integers(-1, CAP, (NB, M0), dtype=np.int32))
        fd = jnp.sort(jnp.asarray(rng.random((NB, M0), dtype=np.float32)))
        return ids, fi, fd

    data = [mk() for _ in range(9)]
    outs = [rev_compute(adj, adjd, *d) for d in data]
    jax.block_until_ready(outs)

    host = [
        tuple(jnp.asarray(np.asarray(v)) for v in o) for o in outs
    ]
    cp = jax.jit(lambda a, b, c: (a + 0, b + 0, c + jnp.float32(0)))
    copied = [cp(*o) for o in outs]
    jax.block_until_ready(copied)

    for name, ins in (("device", outs), ("host-trip", host), ("jit-copy", copied)):
        a2, dd2 = jnp.array(adj), jnp.array(adjd)
        a2, dd2 = rev_apply(a2, dd2, *ins[8])
        jax.block_until_ready((a2, dd2))
        t0 = time.time()
        for i in range(8):
            a2, dd2 = rev_apply(a2, dd2, *ins[i])
        jax.block_until_ready((a2, dd2))
        print(f"apply[{name:9s}]: {(time.time() - t0) / 8 * 1e3:8.2f} ms",
              flush=True)
        del a2, dd2


if len(sys.argv) > 1 and sys.argv[1] == "--variants":
    main_fn = variants
else:
    main_fn = main


if __name__ == "__main__":
    main_fn()
