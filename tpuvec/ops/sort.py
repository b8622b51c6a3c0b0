"""Bitonic networks over the last axis.

``lax.top_k`` / ``lax.sort`` lower to slow generic sorts on TPU for the
beam-merge shapes we care about (~450 us per [256, 384] merge measured
in-loop on v5e). A bitonic network from static shuffles + select compiles
to VPU ops and works under jit, inside Pallas kernels, and on CPU.

Three compare-exchange implementations (``impl=``), measured by ablation
on v5e at the beam-merge shape [256, 16+64] (the merge dominates a whole
beam-search iteration: ~260 us of 360 us):

* ``"roll"`` (default): static lane rolls as concat-of-two-slices +
  select. Works under XLA, Mosaic, and CPU. 260 us.
* ``"xor"``: partner fetch ``x[i ^ j]`` as ONE [.., g, 2, j] reshape +
  ``lax.rev`` per array. Sounds cheaper (half the shuffles) but XLA's
  rev/reshape lowering measured SLOWER: 306 us. Kept for reference.
* ``"proll"``: ``pltpu.roll`` hardware lane rotates — Pallas kernels
  only (one vector instruction per shuffle instead of a materialized
  concat).

Value lanes ride through the network packed: callers with an (id, flag)
pair use pack_iv/unpack_iv to carry ONE int32 payload instead of two.

Two cost tiers:

* ``bitonic_sort`` — full sort, O(log^2 L) stages. Used for unsorted
  inputs.
* ``bitonic_topk_merge_sorted`` — merge an already-sorted beam with a
  block of new candidates. Only the new block pays the full sort; the
  combined sequence is (ascending ++ descending) = bitonic, so one split
  stage + O(log L) merge stages finish the job. This is the beam-search
  hot path.

All lengths must be powers of two (pad with +inf keys).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bitonic_sort",
    "bitonic_topk_merge",
    "bitonic_topk_merge_sorted",
    "bitonic_smallest",
    "pack_iv",
    "unpack_iv",
]


def pack_iv(ids: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    """Pack (id >= -1, bool flag) into one int32 payload: ((id+1)<<1)|f.
    Valid for ids < 2^30 (caps are well below)."""
    return ((ids + 1) << 1) | flag.astype(jnp.int32)


def unpack_iv(p: jnp.ndarray):
    return (p >> 1) - 1, (p & 1).astype(jnp.bool_)


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


def _xor_partner(x: jnp.ndarray, j: int) -> jnp.ndarray:
    """x[i ^ j] along the last axis in ONE shuffle: view the lane axis as
    [g, 2, j] pair-blocks and reverse the pair axis. XLA lowers this to a
    single copy (vs two concat-of-slices rolls that also block fusion of
    the surrounding elementwise ops)."""
    b = x.shape[:-1]
    length = x.shape[-1]
    r = x.reshape(*b, length // (2 * j), 2, j)
    r = jax.lax.rev(r, dimensions=(r.ndim - 2,))
    return r.reshape(*b, length)


def _stage(
    keys, vals, j: int, is_lo: jnp.ndarray, want_small: jnp.ndarray,
    impl: str = "roll",
):
    """One compare-exchange stage with partner distance j.

    Element i pairs with i ^ j; ``is_lo`` marks (i & j) == 0 positions and
    ``want_small`` the positions that keep the smaller key of the pair
    (both broadcastable iota-derived masks). Ties keep the resident
    element on both sides, so the exchange stays consistent.

    impl: see module docstring.
    """
    if impl == "proll":
        from jax.experimental.pallas import tpu as pltpu

        def roll(x, s):
            return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)
    else:
        roll = _roll

    def partner(x):
        if impl == "xor":
            return _xor_partner(x, j)
        # partner value: x[i + j] for lo positions, x[i - j] for hi ones
        return _sel(is_lo, roll(x, -j), roll(x, j))

    kp = partner(keys)
    take = jnp.logical_or(
        jnp.logical_and(want_small, kp < keys),
        jnp.logical_and(jnp.logical_not(want_small), kp > keys),
    )
    keys = jnp.where(take, kp, keys)
    new_vals = [_sel(take, partner(v), v) for v in vals]
    return keys, new_vals


def bitonic_sort(
    keys: jnp.ndarray,
    *vals: jnp.ndarray,
    descending: bool = False,
    impl: str = "roll",
):
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
            keys, vals = _stage(keys, vals, j, is_lo, want_small, impl)
            j //= 2
        k *= 2
    vals = [v.astype(jnp.bool_) if b else v for v, b in zip(vals, was_bool)]
    return (keys, *vals)


def _merge_stages(keys, vals, length: int, impl: str = "roll"):
    """Finish sorting a bitonic sequence: stages j = L/2 .. 1, ascending."""
    iota = _lane_iota(keys.ndim, length)
    j = length // 2
    while j >= 1:
        is_lo = (iota & j) == 0
        keys, vals = _stage(keys, vals, j, is_lo, is_lo, impl)  # ascending
        j //= 2
    return keys, vals


def bitonic_topk_merge_sorted(
    beam_d: jnp.ndarray,
    beam_i: jnp.ndarray,
    beam_x: jnp.ndarray,
    new_d: jnp.ndarray,
    new_i: jnp.ndarray,
    impl: str = "roll",
):
    """Merge a sorted-ascending beam with new candidates; keep smallest EF.

    beam_* [..., EF] with EF a power of two, sorted ascending by beam_d;
    new_* [..., W], any W. Returns (beam_d, beam_i, beam_x) sorted
    ascending, EF wide. New entries come in unexpanded (x = False).

    Cost: full bitonic sort of the new block (W wide, descending) + one
    split stage + log2(max(EF, W)) merge stages — instead of a full
    O(log^2) sort of the whole EF+W concatenation: the (ascending ++
    descending) concatenation is bitonic by construction. The (id, flag)
    pair rides the network as ONE packed int32 payload (pack_iv), so a
    stage moves two arrays, not three.
    """
    ef = beam_d.shape[-1]
    assert ef & (ef - 1) == 0, f"EF={ef} must be a power of two"
    x_bool = beam_x.dtype == jnp.bool_
    beam_p = pack_iv(beam_i, beam_x)
    w = new_d.shape[-1]
    wp = _next_pow2(w)
    new_p = pack_iv(new_i, jnp.zeros(new_i.shape, jnp.bool_))
    if wp != w:
        pad = [(0, 0)] * (new_d.ndim - 1) + [(0, wp - w)]
        new_d = jnp.pad(new_d, pad, constant_values=jnp.inf)
        new_p = jnp.pad(new_p, pad, constant_values=0)  # id -1, unexpanded
    # descending sort: +inf padding lands at the front, so a further
    # front-pad below keeps the block descending (no lax.rev — Mosaic)
    nd, np_ = bitonic_sort(new_d, new_p, descending=True, impl=impl)

    s = max(ef, wp)
    if ef < s:  # widen the beam with +inf tail (stays ascending)
        pad = [(0, 0)] * (beam_d.ndim - 1) + [(0, s - ef)]
        bd = jnp.pad(beam_d, pad, constant_values=jnp.inf)
        bp = jnp.pad(beam_p, pad, constant_values=1)  # id -1, expanded
    else:
        bd, bp = beam_d, beam_p
    if wp < s:
        pad = [(0, 0)] * (nd.ndim - 1) + [(s - wp, 0)]
        nd = jnp.pad(nd, pad, constant_values=jnp.inf)
        np_ = jnp.pad(np_, pad, constant_values=0)

    # split stage of the (ascending ++ descending) bitonic 2s-sequence:
    # lower half takes the pairwise min and is itself bitonic, holding the
    # s smallest elements overall (bitonic split theorem)
    take = nd < bd  # tie keeps the beam entry
    d0 = jnp.where(take, nd, bd)
    p0 = jnp.where(take, np_, bp)
    d0, (p0,) = _merge_stages(d0, [p0], s, impl)
    i0, x0 = unpack_iv(p0[..., :ef])
    x0 = x0 if x_bool else x0.astype(jnp.int32)
    return d0[..., :ef], i0, x0


def rank_topk_merge_sorted(
    beam_d: jnp.ndarray,
    beam_i: jnp.ndarray,
    beam_x: jnp.ndarray,
    new_d: jnp.ndarray,
    new_i: jnp.ndarray,
):
    """Merge beam + candidate window by O(S^2) rank computation.

    Same contract as bitonic_topk_merge_sorted (and stable, so equal keys
    keep beam-then-window order), but with ZERO sequential stages: the
    profiler showed the bitonic network lowering to one 271 us fusion per
    beam iteration (28 dependent compare-exchange stages of cross-lane
    shuffles) while the whole gather+distance step costs ~100 us. Here
    every element's output position is its rank in the union — one
    [S, S] compare-reduce (S = EF + W, ~80: tiny, embarrassingly
    parallel) — and placement is a one-hot select-reduce instead of a
    scatter. O(S^2) beats O(S log^2 S) on the VPU because all the work
    sits in two big fusable reductions with no dependency chain.
    """
    ef = beam_d.shape[-1]
    d = jnp.concatenate([beam_d, new_d], axis=-1)  # [., S]
    p = jnp.concatenate(
        [
            pack_iv(beam_i, beam_x),
            pack_iv(new_i, jnp.zeros(new_i.shape, jnp.bool_)),
        ],
        axis=-1,
    )
    s = d.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
    di = d[..., :, None]
    dj = d[..., None, :]
    # precedes[j, i]: element j sorts before element i (index tie-break)
    precedes = jnp.logical_or(
        dj < di,
        jnp.logical_and(dj == di, iota[None, :] < iota[:, None]),
    )
    rank = jnp.sum(precedes, axis=-1)  # [., S], a permutation of 0..S-1
    onehot = rank[..., :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, ef), 1
    )  # [., S, EF]
    out_d = jnp.sum(jnp.where(onehot, di, 0.0), axis=-2)
    out_p = jnp.sum(jnp.where(onehot, p[..., :, None], 0), axis=-2)
    i0, x0 = unpack_iv(out_p)
    x0 = x0 if beam_x.dtype == jnp.bool_ else x0.astype(beam_x.dtype)
    return out_d, i0, x0


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


def bitonic_smallest(d: jnp.ndarray, *vals: jnp.ndarray, k: int, impl: str = "roll"):
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
    out = bitonic_sort(d, *vals, impl=impl)
    return tuple(o[..., :k] for o in out)
