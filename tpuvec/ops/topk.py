"""Top-k-smallest selection utilities.

Replaces the reference's binary heaps (src/hnsw/search.rs:192-250) with
masked ``lax.top_k`` over fixed-width buffers — the TPU-native selection
primitive (no data-dependent heap ops under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["topk_smallest", "merge_topk"]


def topk_smallest(dists: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Smallest-k along the last axis.

    dists [..., N] f32 (inf = masked out), ids [..., N] int32.
    Returns (dists [..., k], ids [..., k]) sorted ascending by distance.
    """
    neg, idx = jax.lax.top_k(-dists, k)
    sel = jnp.take_along_axis(ids, idx, axis=-1)
    return -neg, sel


def merge_topk(
    d_a: jnp.ndarray, i_a: jnp.ndarray, d_b: jnp.ndarray, i_b: jnp.ndarray, k: int
):
    """Merge two top-k sets (e.g. running result + new chunk) -> smallest k."""
    d = jnp.concatenate([d_a, d_b], axis=-1)
    i = jnp.concatenate([i_a, i_b], axis=-1)
    return topk_smallest(d, i, k)
