"""Pallas fused beam-update kernel.

One beam-search iteration's bookkeeping — beam-membership dedup, distance
masking, bitonic top-EF merge, and next-frontier selection — fused into a
single VMEM-resident kernel. The XLA path runs the same logic as separate
HLO ops (tpuvec/index/search.py); fusing them removes HBM round-trips for
the [B, EF]/[B, W] intermediates between ops.

The kernel is numerics-identical to the XLA path (same bitonic network,
tpuvec/ops/sort.py) and is exercised in interpret mode on CPU by the test
suite; `search_graph(..., use_pallas=True)` selects it.

STATUS (v5e, jax 0.9): compiles under Mosaic and matches the XLA path
bit-for-bit. Getting there required three workarounds (verified by
bisection on the real TPU): (1) the bitonic network uses static lane
rolls instead of the [B, g, 2, j] reshape ladder (ops/sort.py), (2) no
select/concatenate/roll on *boolean* operands anywhere in the kernel —
flags ride as int32, (3) the scalar `active` output is stored via
broadcast_to rather than `[:, None]` indexing.

Layout requirements: EF a power of two; all arrays [B, *].

MEASURED on the real v5e (round 3, scripts/probe_pallas_beam.py, 100K x
768 cosine): the fused kernel is a WASH against the XLA path — 0.94x to
1.01x across B in {64, 256}, ef in {16, 32, 64}, with bit-identical
result ids on hardware. The beam iteration is bound by the random-row
vector gather (which stays in XLA on both paths), not by the merge/dedup
bookkeeping this kernel fuses, so XLA remains the default
(`use_pallas=False`); the kernel is kept as a hardware-validated
alternative backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvec.ops.sort import bitonic_topk_merge_sorted


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last axis via log-step shifted adds
    (static pad/slice only — Mosaic has no cumsum primitive)."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x[..., :-shift], [(0, 0)] * (x.ndim - 1) + [(shift, 0)])
        x = x + shifted
        shift *= 2
    return x

__all__ = ["beam_update", "beam_update_reference"]

_INF = float("inf")  # plain float: a jnp constant would be captured by the kernel


def _beam_update_math(beam_d, beam_i, beam_x, nbrs, nd, n_expand, impl="roll"):
    """The shared math: runs identically inside the kernel and as jnp."""
    b, efp = beam_d.shape
    w = nbrs.shape[1]

    # dedup against beam (chunked) + intra-window dedup when E > 1
    dup = jnp.zeros((b, w), dtype=jnp.bool_)
    for s in range(0, efp, 128):
        blk = beam_i[:, s : s + 128]
        dup = jnp.logical_or(
            dup, jnp.any(nbrs[:, :, None] == blk[:, None, :], axis=-1)
        )
    if n_expand > 1:
        pos = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        cpos = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        earlier = (pos > cpos)[None]
        eq = nbrs[:, :, None] == nbrs[:, None, :]
        dup = jnp.logical_or(dup, jnp.any(jnp.logical_and(eq, earlier), -1))
    fresh = jnp.logical_and(nbrs >= 0, jnp.logical_not(dup))
    ndm = jnp.where(fresh, nd, _INF)
    nim = jnp.where(fresh, nbrs, -1)

    # merge: sorted-beam bitonic merge (split + log-stages, ops/sort.py)
    sd, si, sx = bitonic_topk_merge_sorted(
        beam_d, beam_i, beam_x, ndm, nim, impl=impl
    )
    sx = jnp.logical_or(sx.astype(jnp.bool_), jnp.logical_not(jnp.isfinite(sd)))

    # next frontier: first E unexpanded of the (sorted) beam
    unexp = jnp.logical_and(jnp.logical_not(sx), jnp.isfinite(sd))
    rank = _cumsum_lanes(unexp.astype(jnp.int32))
    cd_best = jnp.min(jnp.where(unexp, sd, _INF), axis=1)
    worst = sd[:, sd.shape[1] - 1]  # positive static index (negative lowers to dynamic_slice)
    active = jnp.logical_and(
        jnp.isfinite(cd_best),
        jnp.logical_or(cd_best <= worst, jnp.logical_not(jnp.isfinite(worst))),
    )
    sel = jnp.logical_and(jnp.logical_and(unexp, rank <= n_expand), active[:, None])
    selrank = _cumsum_lanes(sel.astype(jnp.int32))
    cols = []
    for j in range(n_expand):
        mask_j = jnp.logical_and(sel, selrank == j + 1)  # one-hot per row
        has_j = jnp.any(mask_j, axis=1)
        cid = jnp.sum(jnp.where(mask_j, si, 0), axis=1)  # masked-sum gather
        cols.append(jnp.where(has_j, cid, -1))
    cand = jnp.stack(cols, axis=1)  # no .at[] updates: Mosaic-friendly
    return sd, si, jnp.logical_or(sx, sel), cand, active


def beam_update_reference(beam_d, beam_i, beam_x, nbrs, nd, *, n_expand=1):
    """Pure-jnp form of the fused update (ground truth for the kernel)."""
    return _beam_update_math(beam_d, beam_i, beam_x, nbrs, nd, n_expand)


def _kernel_impl(interpret: bool) -> str:
    # pltpu.roll lowers to a single hardware lane rotate under Mosaic and
    # has a matching interpreter path, so both modes share it
    return "proll"


@functools.partial(jax.jit, static_argnames=("n_expand", "interpret"))
def beam_update(beam_d, beam_i, beam_x, nbrs, nd, *, n_expand=1, interpret=False):
    """Fused beam update as one Pallas kernel.

    beam_d/i/x: [B, EF] (EF pow2, sorted ascending, x=expanded int8/bool);
    nbrs/nd: [B, W] raw gathered neighbors + internal distances
    (EF + W pow2). Returns (beam_d', beam_i', beam_x', cand [B, E],
    active [B]).
    """
    b, efp = beam_d.shape
    e = n_expand

    def kernel(bd, bi, bx, nb, ndr, od, oi, ox, oc, oa):
        sd, si, sx, cand, active = _beam_update_math(
            bd[:], bi[:], bx[:].astype(jnp.bool_), nb[:], ndr[:], e,
            impl=_kernel_impl(interpret),
        )
        od[:] = sd
        oi[:] = si
        ox[:] = sx.astype(jnp.int32)
        oc[:] = cand
        oa[:] = jnp.broadcast_to(active[:, None], (b, 1)).astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, efp), jnp.float32),
            jax.ShapeDtypeStruct((b, efp), jnp.int32),
            jax.ShapeDtypeStruct((b, efp), jnp.int32),
            jax.ShapeDtypeStruct((b, e), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(beam_d, beam_i, beam_x.astype(jnp.int32), nbrs, nd)
    sd, si, sx, cand, active = out
    return sd, si, sx.astype(jnp.bool_), cand, active[:, 0].astype(jnp.bool_)
