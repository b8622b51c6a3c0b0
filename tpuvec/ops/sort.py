"""Bitonic networks over the last axis, built from static rolls + select.

``lax.top_k`` / ``lax.sort`` lower to slow generic sorts on TPU for the
beam-merge shapes we care about (~450 us per [256, 384] merge measured
in-loop on v5e). A bitonic network expressed as static lane-rolls and
elementwise select compiles to pure VPU ops with no cross-lane shuffles
or gathers, and works identically under jit, inside Pallas kernels
(no reshapes — Mosaic chokes on the [B, g, 2, j] reshape ladder), and on
CPU.

Two cost tiers:

* ``bitonic_sort`` — full sort, O(log^2 L) stages. Used for unsorted
  inputs.
* ``bitonic_topk_merge_sorted`` — merge an already-sorted beam with a
  block of new candidates. Only the new block pays the full sort; the
  combined sequence is (ascending ++ descending) = bitonic, so one split
  stage + O(log L) merge stages finish the job. This is the beam-search
  hot path: the beam is sorted ascending by construction, so the old
  full-sort-everything merge wasted ~2-3x the VPU work.

All lengths must be powers of two (pad with +inf keys).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "bitonic_sort",
    "bitonic_topk_merge",
    "bitonic_topk_merge_sorted",
    "bitonic_smallest",
]


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Static roll along the last axis (shift > 0 rolls right).

    Written as concat of two static slices: supported by XLA, Mosaic,
    and the Pallas interpreter alike (jnp.roll lowers to the same thing
    but via lax.rev on some paths, which Mosaic rejects).
    """
    n = x.shape[-1]
    s = shift % n
    if s == 0:
        return x
    return jnp.concatenate([x[..., n - s :], x[..., : n - s]], axis=-1)


def _lane_iota(ndim: int, length: int) -> jnp.ndarray:
    """[1, ..., 1, L] int32 iota along the last axis.

    Built inside the trace (not a numpy constant): Pallas kernels reject
    captured array constants, and Mosaic has native iota support.
    """
    import jax

    shape = (1,) * max(ndim - 1, 1) + (length,)
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _sel(pred, a, b):
    """where(pred, a, b) that avoids bool-valued select (Mosaic rejects
    selects whose *operands* are booleans; logical form lowers fine)."""
    if a.dtype == jnp.bool_:
        return jnp.logical_or(
            jnp.logical_and(pred, a), jnp.logical_and(jnp.logical_not(pred), b)
        )
    return jnp.where(pred, a, b)


def _stage(keys, vals, j: int, is_lo: jnp.ndarray, want_small: jnp.ndarray):
    """One compare-exchange stage with partner distance j.

    Element i pairs with i ^ j; ``is_lo`` marks (i & j) == 0 positions and
    ``want_small`` the positions that keep the smaller key of the pair
    (both broadcastable iota-derived masks). Ties keep the resident
    element on both sides, so the exchange stays consistent.
    """
    # partner value: x[i + j] for lo positions, x[i - j] for hi positions
    kp = jnp.where(is_lo, _roll(keys, -j), _roll(keys, j))
    take = jnp.logical_or(
        jnp.logical_and(want_small, kp < keys),
        jnp.logical_and(jnp.logical_not(want_small), kp > keys),
    )
    keys = jnp.where(take, kp, keys)
    new_vals = []
    for v in vals:
        vp = _sel(is_lo, _roll(v, -j), _roll(v, j))
        new_vals.append(_sel(take, vp, v))
    return keys, new_vals


def bitonic_sort(keys: jnp.ndarray, *vals: jnp.ndarray, descending: bool = False):
    """Sort by keys along the last axis (ascending by default); vals follow.

    keys [..., L] with L a power of two. Returns (keys, vals...).
    """
    length = keys.shape[-1]
    assert length & (length - 1) == 0, f"L={length} must be a power of two"
    # bool values ride as int32 (Mosaic rejects concatenate/roll on bools)
    was_bool = [v.dtype == jnp.bool_ for v in vals]
    vals = [v.astype(jnp.int32) if b else v for v, b in zip(vals, was_bool)]
    iota = _lane_iota(keys.ndim, length)
    k = 2
    while k <= length:
        # ascending-block mask for sub-sequence size k (final pass: all asc)
        if k >= length:
            dirs = jnp.full(iota.shape, not descending)
        else:
            dirs = ((iota & k) == 0) != descending
        j = k // 2
        while j >= 1:
            is_lo = (iota & j) == 0
            want_small = is_lo == dirs
            keys, vals = _stage(keys, vals, j, is_lo, want_small)
            j //= 2
        k *= 2
    vals = [v.astype(jnp.bool_) if b else v for v, b in zip(vals, was_bool)]
    return (keys, *vals)


def _merge_stages(keys, vals, length: int):
    """Finish sorting a bitonic sequence: stages j = L/2 .. 1, ascending."""
    iota = _lane_iota(keys.ndim, length)
    j = length // 2
    while j >= 1:
        is_lo = (iota & j) == 0
        keys, vals = _stage(keys, vals, j, is_lo, is_lo)  # ascending
        j //= 2
    return keys, vals


def bitonic_topk_merge_sorted(
    beam_d: jnp.ndarray,
    beam_i: jnp.ndarray,
    beam_x: jnp.ndarray,
    new_d: jnp.ndarray,
    new_i: jnp.ndarray,
):
    """Merge a sorted-ascending beam with new candidates; keep smallest EF.

    beam_* [..., EF] with EF a power of two, sorted ascending by beam_d;
    new_* [..., W], any W. Returns (beam_d, beam_i, beam_x) sorted
    ascending, EF wide. New entries come in unexpanded (x = False).

    Cost: full bitonic sort of the new block (W wide, descending) + one
    split stage + log2(max(EF, W)) merge stages — instead of a full
    O(log^2) sort of the whole EF+W concatenation: the (ascending ++
    descending) concatenation is bitonic by construction.
    """
    ef = beam_d.shape[-1]
    assert ef & (ef - 1) == 0, f"EF={ef} must be a power of two"
    # carry the flag as int32: Mosaic rejects concatenate/roll on booleans,
    # and the network rolls every value lane-wise each stage
    x_bool = beam_x.dtype == jnp.bool_
    beam_x = beam_x.astype(jnp.int32)
    w = new_d.shape[-1]
    wp = _next_pow2(w)
    if wp != w:
        pad = [(0, 0)] * (new_d.ndim - 1) + [(0, wp - w)]
        new_d = jnp.pad(new_d, pad, constant_values=jnp.inf)
        new_i = jnp.pad(new_i, pad, constant_values=-1)
    # descending sort: +inf padding lands at the front, so a further
    # front-pad below keeps the block descending (no lax.rev — Mosaic)
    nd, ni = bitonic_sort(new_d, new_i, descending=True)

    s = max(ef, wp)
    batch = beam_d.shape[:-1]
    if ef < s:  # widen the beam with +inf tail (stays ascending)
        pad = [(0, 0)] * (beam_d.ndim - 1) + [(0, s - ef)]
        bd = jnp.pad(beam_d, pad, constant_values=jnp.inf)
        bi = jnp.pad(beam_i, pad, constant_values=-1)
        bx = jnp.pad(beam_x, pad, constant_values=1)
    else:
        bd, bi, bx = beam_d, beam_i, beam_x
    if wp < s:
        pad = [(0, 0)] * (nd.ndim - 1) + [(s - wp, 0)]
        nd = jnp.pad(nd, pad, constant_values=jnp.inf)
        ni = jnp.pad(ni, pad, constant_values=-1)
    nx = jnp.zeros(batch + (s,), dtype=jnp.int32)

    # split stage of the (ascending ++ descending) bitonic 2s-sequence:
    # lower half takes the pairwise min and is itself bitonic, holding the
    # s smallest elements overall (bitonic split theorem)
    take = nd < bd  # tie keeps the beam entry
    d0 = jnp.where(take, nd, bd)
    i0 = jnp.where(take, ni, bi)
    x0 = jnp.where(take, nx, bx)
    d0, (i0, x0) = _merge_stages(d0, [i0, x0], s)
    x0 = x0[..., :ef].astype(jnp.bool_) if x_bool else x0[..., :ef]
    return d0[..., :ef], i0[..., :ef], x0


def bitonic_topk_merge(
    beam_d: jnp.ndarray,
    beam_i: jnp.ndarray,
    beam_x: jnp.ndarray,
    new_d: jnp.ndarray,
    new_i: jnp.ndarray,
):
    """Merge a *sorted-ascending* beam with new candidates; keep smallest EF.

    Back-compat wrapper over bitonic_topk_merge_sorted (the beam in every
    caller is sorted ascending by construction; seed beams qualify because
    all non-seed slots are +inf).
    """
    return bitonic_topk_merge_sorted(beam_d, beam_i, beam_x, new_d, new_i)


def bitonic_smallest(d: jnp.ndarray, *vals: jnp.ndarray, k: int):
    """Smallest-k along the last axis via one bitonic sort + slice.

    d [..., L] (L any width; padded to a power of two with +inf), vals
    follow. Returns (d [..., k] ascending, vals...). Replaces lax.top_k,
    which lowers to a slow generic sort on TPU at these shapes.
    """
    w = d.shape[-1]
    wp = _next_pow2(w)
    if wp != w:
        pad = [(0, 0)] * (d.ndim - 1) + [(0, wp - w)]
        d = jnp.pad(d, pad, constant_values=jnp.inf)
        vals = tuple(jnp.pad(v, pad, constant_values=-1) for v in vals)
    out = bitonic_sort(d, *vals)
    return tuple(o[..., :k] for o in out)
