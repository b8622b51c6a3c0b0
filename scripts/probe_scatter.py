"""Raw scatter formulation search: 31K random-row updates into [1M, 32].

profile_reverse_bisect.py showed each in-composition scatter costs
~140 ms while an input-fed scatter with 1K live rows measured 0.1 ms.
This isolates what makes a 32K-row scatter fast or slow: live-row count,
sortedness, unique_indices, donation, and a fori_loop DUS alternative.
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

from tpuvec.utils.safecache import enable_atomic_cache_writes

enable_atomic_cache_writes()

CAP, M0, KEEP, P_N = 1_000_000, 32, 16, 32768


def main():
    rng = np.random.default_rng(11)
    adj = jnp.asarray(rng.integers(-1, CAP, (CAP, M0), dtype=np.int32))
    adjd = jnp.asarray(rng.random((CAP, M0), dtype=np.float32))

    def mk():
        # ~31K unique random targets, sorted; ~1.5K dropped (CAP)
        t = np.unique(rng.integers(0, CAP, P_N, dtype=np.int32))
        tgt = np.full(P_N, CAP, np.int32)
        tgt[: t.shape[0]] = t  # sorted unique first, CAP tail
        rows = rng.integers(-1, CAP, (P_N, KEEP), dtype=np.int32)
        rowsd = rng.random((P_N, KEEP), dtype=np.float32)
        shuf = rng.permutation(P_N)
        return (
            jnp.asarray(tgt), jnp.asarray(tgt[shuf]),
            jnp.asarray(rows), jnp.asarray(rowsd),
        )

    data = [mk() for _ in range(9)]
    jax.block_until_ready(data)

    from functools import partial

    @partial(jax.jit, donate_argnames=("adj", "adjd"))
    def scat(adj, adjd, tgt, rows, rowsd, **kw):
        adj = adj.at[tgt, KEEP:].set(rows, mode="drop", **kw)
        adjd = adjd.at[tgt, KEEP:].set(rowsd, mode="drop", **kw)
        return adj, adjd

    @partial(jax.jit, donate_argnames=("adj", "adjd"))
    def scat_sorted(adj, adjd, tgt, rows, rowsd):
        adj = adj.at[tgt, KEEP:].set(
            rows, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        adjd = adjd.at[tgt, KEEP:].set(
            rowsd, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return adj, adjd

    @partial(jax.jit, donate_argnames=("adj",))
    def scat_one(adj, tgt, rows):
        return adj.at[tgt, KEEP:].set(rows, mode="drop")

    @partial(jax.jit, donate_argnames=("adj", "adjd"))
    def scat_fullrow(adj, adjd, tgt, rows, rowsd):
        # write the FULL row (all 32 cols): update = gather old prefix ++ new
        pre = adj[jnp.minimum(tgt, CAP - 1), :KEEP]
        pred = adjd[jnp.minimum(tgt, CAP - 1), :KEEP]
        adj = adj.at[tgt, :].set(
            jnp.concatenate([pre, rows], axis=1), mode="drop"
        )
        adjd = adjd.at[tgt, :].set(
            jnp.concatenate([pred, rowsd], axis=1), mode="drop"
        )
        return adj, adjd

    variants = [
        ("unsorted", lambda d: scat(adj_c[0], adj_c[1], d[1], d[2], d[3])),
        ("sorted+flags", lambda d: scat_sorted(adj_c[0], adj_c[1], d[0], d[2], d[3])),
        ("one array", lambda d: (scat_one(adj_c[0], d[0], d[2]), adj_c[1])),
        ("fullrow", lambda d: scat_fullrow(adj_c[0], adj_c[1], d[0], d[2], d[3])),
    ]
    for name, fn in variants:
        adj_c = (jnp.array(adj), jnp.array(adjd))
        adj_c = fn(data[-1])
        jax.block_until_ready(adj_c)
        t0 = time.time()
        for i in range(8):
            adj_c = fn(data[i])
        jax.block_until_ready(adj_c)
        print(f"{name:14s} {(time.time() - t0) / 8 * 1e3:8.2f} ms", flush=True)
        del adj_c


if __name__ == "__main__":
    main()
