"""Device-side exact rerank for coarse (binary/int8) search results.

The reference has the ingredients (bit vectors + Hamming + stored f32
originals, src/vector.rs:579-608, src/distance/scalar.rs:102-112) but
reranks, when users assemble it, on the host. Here the coarse candidate
slots stay on device: one gather from a device-resident shadow of the
original vectors, a fused distance computation in the *user* metric, and
a bitonic top-k — no candidate matrix ever crosses the PCIe/host boundary.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpuvec.ops.sort import bitonic_smallest, bitonic_sort
from tpuvec.types import DistanceMetric

__all__ = ["rerank_topk", "expand_rerank_topk"]

_INF = jnp.float32(jnp.inf)


def _exact_dists(shadow, slots, ok, qf, metric: DistanceMetric):
    """Exact distances in the *user* metric over gathered candidate rows:
    [B, C] (invalid -> inf).

    The gathered-candidate tensor is [B, C, D] f32; at expansion widths
    (C = coarse_k * (M0+1)) and 10M-scale shadows this transient is
    multi-GB on top of an HBM already holding the shadow — so past a
    byte threshold (default 512 MB, TPUVEC_RERANK_CHUNK_MB) the
    candidate axis is processed in fixed-width chunks under lax.scan,
    bounding the working set at one chunk while leaving the result
    bit-identical (each chunk runs the same fused gather+distance)."""
    import os

    b, c = slots.shape
    d = shadow.shape[1]
    limit = int(os.environ.get("TPUVEC_RERANK_CHUNK_MB", 512)) << 20
    if b * c * d * 4 > limit:
        cw = max(128, limit // (b * d * 4))
        if cw < c:
            g = -(-c // cw)
            pad = g * cw - c
            slots_p = jnp.pad(slots, ((0, 0), (0, pad)), constant_values=-1)
            ok_p = jnp.pad(ok, ((0, 0), (0, pad)), constant_values=False)
            sl = slots_p.reshape(b, g, cw).transpose(1, 0, 2)
            okl = ok_p.reshape(b, g, cw).transpose(1, 0, 2)

            def body(_, inp):
                s, o = inp
                return None, _exact_dists_block(shadow, s, o, qf, metric)

            _, dds = jax.lax.scan(body, None, (sl, okl))  # [G, B, CW]
            return dds.transpose(1, 0, 2).reshape(b, g * cw)[:, :c]
    return _exact_dists_block(shadow, slots, ok, qf, metric)


def _exact_dists_block(shadow, slots, ok, qf, metric: DistanceMetric):
    corpus = shadow[jnp.maximum(slots, 0)].astype(jnp.float32)  # [B, C, D]
    if metric is DistanceMetric.L2:
        diff = corpus - qf[:, None, :]
        dd = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    elif metric is DistanceMetric.L1:
        dd = jnp.sum(jnp.abs(corpus - qf[:, None, :]), axis=-1)
    else:  # cosine distance on raw vectors
        dots = jnp.einsum(
            "bcd,bd->bc", corpus, qf,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cn = jnp.sqrt(jnp.sum(corpus * corpus, axis=-1))
        qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))[:, None]
        denom = jnp.maximum(cn * qn, 1e-30)
        dd = 1.0 - dots / denom
    return jnp.where(ok, dd, _INF)


@partial(jax.jit, static_argnames=("metric", "k"))
def rerank_topk(
    shadow: jnp.ndarray,   # [cap, D] originals (f32 or int8)
    slots: jnp.ndarray,    # [B, C] coarse candidate slots (-1 = invalid)
    ok: jnp.ndarray,       # [B, C] bool validity (mask filters folded in)
    qf: jnp.ndarray,       # [B, D] f32 queries (original space)
    *,
    metric: DistanceMetric,
    k: int,
):
    """Exact top-k over gathered candidates in the output metric.

    Returns (dists [B, k] ascending in the user metric, slots [B, k]).
    """
    dd = _exact_dists(shadow, slots, ok, qf, metric)
    out_d, out_i = bitonic_smallest(dd, slots, k=k)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_d, out_i


_SENTINEL = jnp.int32(2**31 - 1)


def _dedup_smallest(dd, ids, k: int):
    """Top-k by distance with duplicate ids removed — exact.

    Sort the FULL candidate set by id (one bitonic network over static
    reshapes, ops/sort.py), mask every element equal to its left
    neighbor, then bitonic-select the k smallest distances. Duplicate
    ids always carry identical distances (the same row reranked twice),
    so keeping one arbitrary occurrence is exact. Deduping before the
    top-k selection matters: in a dense cluster one node can appear as
    a neighbor of most of the coarse candidates, and a truncate-then-
    dedup scheme returns fewer than k distinct rows.
    """
    w = ids.shape[-1]
    length = 1 << (w - 1).bit_length()
    keys = jnp.where(jnp.isfinite(dd), ids, _SENTINEL)  # invalid -> end
    if length > w:
        pad = ((0, 0),) * (ids.ndim - 1) + ((0, length - w),)
        keys = jnp.pad(keys, pad, constant_values=2**31 - 1)
        dd = jnp.pad(dd, pad, constant_values=jnp.inf)
    keys_s, dd_s = bitonic_sort(keys, dd)
    prev = jnp.roll(keys_s, 1, axis=-1)
    first = jnp.arange(length) == 0
    dup = jnp.logical_and(keys_s == prev, jnp.logical_not(first))
    dd_s = jnp.where(dup, _INF, dd_s)
    ids_s = jnp.where(keys_s == _SENTINEL, -1, keys_s)
    out_d, out_i = bitonic_smallest(dd_s, ids_s, k=k)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_d, out_i


@partial(jax.jit, static_argnames=("metric", "k"))
def expand_rerank_topk(
    shadow: jnp.ndarray,   # [cap, D] originals (f32 or int8)
    adj0: jnp.ndarray,     # [cap(+1), M0] level-0 adjacency (graph slots)
    slots: jnp.ndarray,    # [B, C] coarse candidate slots (-1 = invalid)
    ok: jnp.ndarray,       # [B, C] bool validity
    qf: jnp.ndarray,       # [B, D] f32 queries (original space)
    *,
    metric: DistanceMetric,
    k: int,
    filter_mask: jnp.ndarray | None = None,  # [cap] bool (live & filters)
):
    """One-hop neighbor expansion + exact rerank: top-k over the coarse
    candidates AND their level-0 graph neighbors.

    Quantized (binary/int8) coarse search hits a recall ceiling because
    the beam ranks in the quantized space: a true neighbor just outside
    the coarse top-C is usually *adjacent* to one inside it, so reranking
    C*(M0+1) expanded candidates in exact space recovers it without the
    O(ef) cost of a deeper beam (measured round 3, 1M x 1024 binary:
    C=64 coarse 0.68 -> expanded 0.95+ at a fraction of the C=192 beam
    cost). Composition the reference never had: its rerank-free binary
    path stops at the Hamming ranking (src/vector.rs:579-608).

    Duplicates inside the expansion (shared neighbors) are removed during
    final selection (_dedup_smallest). Returns (dists [B, k], slots [B, k]).
    """
    b, c = slots.shape
    nbrs = adj0[jnp.maximum(slots, 0)]                     # [B, C, M0]
    nbrs = jnp.where(ok[:, :, None], nbrs, -1).reshape(b, -1)
    cand = jnp.concatenate([jnp.where(ok, slots, -1), nbrs], axis=1)
    okc = cand >= 0
    if filter_mask is not None:
        # expanded neighbors must re-check liveness + query filters: the
        # coarse slots were filtered by the beam, their graph neighbors
        # were not (and adjacency may hold stale edges to deleted slots)
        okc = jnp.logical_and(
            okc, filter_mask[jnp.clip(cand, 0, filter_mask.shape[0] - 1)]
        )
    dd = _exact_dists(shadow, cand, okc, qf, metric)
    return _dedup_smallest(dd, cand, k)
