"""Microbenchmark the beam-search inner-loop ops at bench shapes.

Run on the real TPU: python scripts/profile_ops.py
Identifies which of gather / scatter / top_k / einsum dominates one
iteration of beam_search_level0 (tpuvec/index/search.py).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache_tpu")


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt * 1e6:10.1f} us")
    return dt


def main():
    print(jax.devices())
    n, d, b, m0, ef = 100_000, 768, 256, 64, 128
    w = 4 * m0  # n_expand=4
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    adj = jnp.asarray(rng.integers(0, n, (n, m0)), dtype=jnp.int32)
    visited = jnp.zeros((b, n), dtype=jnp.uint8)
    cand = jnp.asarray(rng.integers(0, n, (b, 4)), dtype=jnp.int32)
    nbrs = jnp.asarray(rng.integers(0, n, (b, w)), dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, d)), dtype=jnp.float32)
    beam_d = jnp.sort(jnp.asarray(rng.standard_normal((b, ef)), dtype=jnp.float32))
    nd = jnp.asarray(rng.standard_normal((b, w)), dtype=jnp.float32)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None].repeat(w, 1)

    adj_gather = jax.jit(lambda a, c: a[jnp.maximum(c, 0)])
    timeit("adjacency gather [B,4,M0]", adj_gather, adj, cand)

    vec_gather = jax.jit(lambda v, nb: v[nb])
    timeit("vector gather [B,W,D] (150MB)", vec_gather, vectors, nbrs)

    def dists(v, qq, nb):
        nv = v[nb]
        qx = jnp.einsum("bd,bwd->bw", qq, nv, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(nv * nv, axis=-1) - 2 * qx

    timeit("gather+einsum dist [B,W]", jax.jit(dists), vectors, q, nbrs)

    vis_gather = jax.jit(
        lambda nb: visited.at[rows, nb].get(mode="fill", fill_value=1)
    )
    timeit("visited gather [B,W]", vis_gather, nbrs)

    vis_scatter = jax.jit(
        lambda v, nb: v.at[rows, nb].max(jnp.uint8(1), mode="drop")
    )
    timeit("visited scatter [B,W]", vis_scatter, visited, nbrs)

    def merge(bd, ndd):
        all_d = jnp.concatenate([bd, ndd], axis=1)
        negv, sel = jax.lax.top_k(-all_d, ef)
        return -negv, sel

    timeit("top_k merge [B,ef+W]->ef", jax.jit(merge), beam_d, nd)

    def beam_dedup(nb, bi):
        same = nb[:, :, None] == bi[:, None, :]
        return jnp.any(same, axis=-1)

    bi = jnp.asarray(rng.integers(0, n, (b, ef)), dtype=jnp.int32)
    timeit("beam-membership dedup [B,W,ef]", jax.jit(beam_dedup), nbrs, bi)

    def intra_dedup(nb):
        same = nb[:, :, None] == nb[:, None, :]
        earlier = jnp.tril(jnp.ones((w, w), dtype=jnp.bool_), k=-1)
        return jnp.any(jnp.logical_and(same, earlier[None]), axis=-1)

    timeit("intra-iteration dedup [B,W,W]", jax.jit(intra_dedup), nbrs)

    # brute-force chunk for reference
    x_chunk = vectors[:16384]

    def bf(xc, qq):
        qx = jnp.dot(qq, xc.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(qx, 10)

    timeit("bf matmul+topk [256 x 16384]", jax.jit(bf), x_chunk, q)

    def bf_default(xc, qq):
        qx = jnp.dot(qq, xc.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(qx, 10)

    timeit("bf matmul+topk default prec", jax.jit(bf_default), x_chunk, q)

    def bf_nomerge(xc, qq):
        return jnp.dot(qq, xc.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    timeit("bf matmul only", jax.jit(bf_nomerge), x_chunk, q)

    def topk_only(s):
        return jax.lax.top_k(s, 10)

    scores = jnp.asarray(rng.standard_normal((b, 16384)), dtype=jnp.float32)
    timeit("top_k(10) on [256,16384]", jax.jit(topk_only), scores)

    def approx_topk(s):
        return jax.lax.approx_max_k(s, 10)

    timeit("approx_max_k(10) on [256,16384]", jax.jit(approx_topk), scores)


if __name__ == "__main__":
    main()
