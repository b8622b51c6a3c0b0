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

from tpuvec.ops.sort import bitonic_smallest
from tpuvec.types import DistanceMetric

__all__ = ["rerank_topk"]

_INF = jnp.float32(jnp.inf)


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
    dd = jnp.where(ok, dd, _INF)
    out_d, out_i = bitonic_smallest(dd, slots, k=k)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_d, out_i
