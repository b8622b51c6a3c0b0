"""Batched HNSW search: greedy upper-level descent + level-0 beam.

TPU-native recast of the reference's search_hnsw / search_layer
(src/hnsw/search.rs:267-533). The reference walks the graph one node at a
time, issuing a cached SQLite statement per edge-list fetch and 1-64 point
queries per neighbor batch; here a whole batch of queries advances in
lock-step inside one jit region:

* the candidate/result heaps (search.rs:192-250) become a fixed-width beam
  buffer updated with masked lax.top_k;
* the HybridVisited bitset (search.rs:19-52) becomes a uint8 [B, cap]
  scatter/gather array;
* the per-node FFI fetches become vectorized gathers of adjacency rows and
  vector tiles straight from HBM;
* the data-dependent traversal loop becomes a lax.while_loop with a static
  trip bound (`max_iters`) and per-query active masks — queries that
  terminate early ride along masked.

``n_expand`` expands the E best unexpanded candidates per iteration instead
of 1 (same beam semantics, ~E x fewer sequential iterations — the lever
that hides gather latency on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpuvec.index.graph import GraphState, HnswConfig
from tpuvec.ops.distance import gathered_internal, internal_to_output

__all__ = ["search_graph", "search", "descend_to_level1"]

_INF = jnp.float32(jnp.inf)


def _gather_vecs(state: GraphState, ids: jnp.ndarray) -> jnp.ndarray:
    """vectors[ids] with ids possibly -1 (caller masks distances)."""
    safe = jnp.maximum(ids, 0)
    return state.vectors[safe]


def _node_dist(config: HnswConfig, state: GraphState, q: jnp.ndarray, ids: jnp.ndarray):
    """Internal distance q[b] -> node ids[b, ...]; invalid ids -> inf."""
    vecs = _gather_vecs(state, ids)  # [..., Dp]
    if ids.ndim == 1:
        d = gathered_internal(
            config.graph_metric, q, vecs[:, None, :], normalized=config.normalized
        )[:, 0]
    else:
        d = gathered_internal(
            config.graph_metric, q, vecs, normalized=config.normalized
        )
    return jnp.where(ids >= 0, d, _INF)


# --------------------------------------------------------------------------
# Greedy descent over upper levels (ef = 1), reference search.rs:318-323
# --------------------------------------------------------------------------


def descend_to_level1(
    config: HnswConfig,
    state: GraphState,
    q: jnp.ndarray,
    *,
    max_steps: int = 64,
):
    """Greedy-descend every query from the entry point down to level 1.

    Returns (cur [B] i32, cur_d [B] f32): the best node found per query,
    used to seed the level-0 beam. Works when entry_level == 0 too (no-op).
    """
    b = q.shape[0]
    entry = state.entry_point
    cur = jnp.full((b,), entry, dtype=jnp.int32)
    cur_d = _node_dist(config, state, q, cur)

    def run_level(lev: int, cur, cur_d):
        def cond(carry):
            _, _, moved, it = carry
            return jnp.logical_and(moved, it < max_steps)

        def body(carry):
            cur, cur_d, _, it = carry
            slots = state.upper_slot[jnp.maximum(cur, 0)]          # [B]
            nbrs = state.upper_adj[jnp.maximum(slots, 0), lev - 1]  # [B, M]
            nbrs = jnp.where(slots[:, None] >= 0, nbrs, -1)
            nd = _node_dist(config, state, q, nbrs)                 # [B, M]
            best = jnp.argmin(nd, axis=-1)
            bd = jnp.min(nd, axis=-1)
            move = bd < cur_d
            new_cur = jnp.where(
                move, jnp.take_along_axis(nbrs, best[:, None], 1)[:, 0], cur
            )
            new_d = jnp.where(move, bd, cur_d)
            return new_cur, new_d, jnp.any(move), it + 1

        cur, cur_d, _, _ = jax.lax.while_loop(
            cond, body, (cur, cur_d, jnp.bool_(True), jnp.int32(0))
        )
        return cur, cur_d

    for lev in range(config.lu, 0, -1):
        cur, cur_d = jax.lax.cond(
            state.entry_level >= lev,
            lambda c, d, lev=lev: run_level(lev, c, d),
            lambda c, d: (c, d),
            cur,
            cur_d,
        )
    return cur, cur_d


# --------------------------------------------------------------------------
# Level-0 beam (ef candidates), reference search.rs:340-533
# --------------------------------------------------------------------------


def beam_search_level0(
    config: HnswConfig,
    state: GraphState,
    q: jnp.ndarray,
    seed_ids: jnp.ndarray,
    seed_dists: jnp.ndarray,
    *,
    ef: int,
    max_iters: int,
    n_expand: int = 1,
):
    """Best-first beam search at level 0.

    q [B, Dp]; seed_ids/seed_dists [B] from the descent. Returns
    (beam_d [B, ef] ascending, beam_i [B, ef], iters) in internal distance.
    """
    b = q.shape[0]
    e = n_expand
    m0 = config.max_m0
    width = e * m0

    beam_d = jnp.full((b, ef), _INF, dtype=jnp.float32)
    beam_i = jnp.full((b, ef), -1, dtype=jnp.int32)
    beam_x = jnp.ones((b, ef), dtype=jnp.bool_)  # expanded (padding = True)
    beam_d = beam_d.at[:, 0].set(jnp.where(seed_ids >= 0, seed_dists, _INF))
    beam_i = beam_i.at[:, 0].set(seed_ids)
    beam_x = beam_x.at[:, 0].set(seed_ids < 0)

    visited = jnp.zeros((b, config.cap), dtype=jnp.uint8)
    rows_b = jnp.arange(b, dtype=jnp.int32)[:, None]
    visited = visited.at[
        rows_b[:, 0], jnp.maximum(seed_ids, 0)
    ].set(jnp.uint8(1))

    def frontier(beam_d, beam_i, beam_x):
        """Best-E unexpanded candidates and the per-query active flag."""
        unexp = jnp.where(beam_x, _INF, beam_d)
        negv, pos = jax.lax.top_k(-unexp, e)       # [B, E] best-first
        cd = -negv
        worst = jnp.max(beam_d, axis=-1)           # inf until beam fills
        active = jnp.logical_and(jnp.isfinite(cd[:, 0]), cd[:, 0] <= worst)
        return pos, cd, active

    def cond(carry):
        beam_d, beam_i, beam_x, visited, it = carry
        _, _, active = frontier(beam_d, beam_i, beam_x)
        return jnp.logical_and(jnp.any(active), it < max_iters)

    def body(carry):
        beam_d, beam_i, beam_x, visited, it = carry
        pos, cd, active = frontier(beam_d, beam_i, beam_x)   # pos [B, E]
        cand = jnp.take_along_axis(beam_i, pos, axis=1)      # [B, E]
        cand_ok = jnp.logical_and(jnp.isfinite(cd), active[:, None])

        # mark the expanded positions (masked by activity/validity)
        onehot = jnp.zeros_like(beam_x)
        onehot = onehot.at[rows_b.repeat(e, 1), pos].max(cand_ok)
        beam_x = jnp.logical_or(beam_x, onehot)

        # gather adjacency rows [B, E, M0] -> flatten [B, E*M0]
        nbrs = state.adj0[jnp.maximum(cand, 0)]              # [B, E, M0]
        nbrs = jnp.where(cand_ok[:, :, None], nbrs, -1).reshape(b, width)
        valid = nbrs >= 0

        # visited filter (gather; out-of-range = "seen")
        cols = jnp.where(valid, nbrs, config.cap)
        seen = visited.at[rows_b.repeat(width, 1), cols].get(
            mode="fill", fill_value=1
        )
        fresh = jnp.logical_and(valid, seen == 0)

        if e > 1:
            # intra-iteration dedup: drop later copies of the same id
            same = nbrs[:, :, None] == nbrs[:, None, :]      # [B, W, W]
            earlier = jnp.tril(jnp.ones((width, width), dtype=jnp.bool_), k=-1)
            dup = jnp.any(jnp.logical_and(same, earlier[None]), axis=-1)
            fresh = jnp.logical_and(fresh, jnp.logical_not(dup))

        visited = visited.at[rows_b.repeat(width, 1), cols].max(
            jnp.uint8(1), mode="drop"
        )

        nd = _node_dist(config, state, q, jnp.where(fresh, nbrs, -1))  # [B, W]

        # merge beam + fresh neighbors, keep smallest ef
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_i = jnp.concatenate([beam_i, jnp.where(fresh, nbrs, -1)], axis=1)
        all_x = jnp.concatenate(
            [beam_x, jnp.zeros((b, width), dtype=jnp.bool_)], axis=1
        )
        negv, sel = jax.lax.top_k(-all_d, ef)
        beam_d = -negv
        beam_i = jnp.take_along_axis(all_i, sel, axis=1)
        beam_x = jnp.take_along_axis(all_x, sel, axis=1)
        # padding slots (inf) must stay expanded so they are never frontier
        beam_x = jnp.logical_or(beam_x, jnp.logical_not(jnp.isfinite(beam_d)))
        return beam_d, beam_i, beam_x, visited, it + 1

    beam_d, beam_i, beam_x, visited, iters = jax.lax.while_loop(
        cond, body, (beam_d, beam_i, beam_x, visited, jnp.int32(0))
    )
    return beam_d, beam_i, iters


# --------------------------------------------------------------------------
# Full search
# --------------------------------------------------------------------------


def default_max_iters(ef: int, n_expand: int) -> int:
    return -(-3 * ef // (2 * n_expand)) + 8


@partial(
    jax.jit,
    static_argnames=("config", "k", "ef", "max_iters", "n_expand"),
)
def search_graph(
    config: HnswConfig,
    state: GraphState,
    q: jnp.ndarray,
    *,
    k: int,
    ef: int | None = None,
    max_iters: int | None = None,
    n_expand: int = 1,
):
    """Batched k-NN over the graph in *internal* distance space.

    q [B, Dp] must already be prepared (prepare_queries). Returns
    (dists [B, k], ids [B, k]) ascending; empty index -> (inf, -1).
    ef defaults to max(ef_search, k) (reference search.rs:280).
    """
    ef = max(ef or config.ef_search, k)
    if max_iters is None:
        max_iters = default_max_iters(ef, n_expand)
    seed_ids, seed_d = descend_to_level1(config, state, q)
    beam_d, beam_i, _ = beam_search_level0(
        config,
        state,
        q,
        seed_ids,
        seed_d,
        ef=ef,
        max_iters=max_iters,
        n_expand=n_expand,
    )
    out_d = beam_d[:, :k]
    out_i = beam_i[:, :k]
    empty = state.entry_point < 0
    out_d = jnp.where(empty, _INF, out_d)
    out_i = jnp.where(empty, -1, out_i)
    return out_d, out_i


def search(
    config: HnswConfig,
    state: GraphState,
    q: jnp.ndarray,
    *,
    k: int,
    ef: int | None = None,
    n_expand: int = 1,
):
    """User-facing search: internal distances converted to the output
    metric (reference search.rs:330-334 + mod.rs:139-146)."""
    d, i = search_graph(config, state, q, k=k, ef=ef, n_expand=n_expand)
    out = internal_to_output(config.metric, d, normalized=config.normalized)
    return jnp.where(jnp.isfinite(d), out, _INF), i
