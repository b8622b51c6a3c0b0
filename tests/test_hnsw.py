"""HNSW build + search tests vs the brute-force oracle.

Mirrors the reference's recall suite (tests/test_recall_accuracy.rs:
recall@10 >= 0.95 vs in-test ground truth; test_recall_cosine.rs;
test_recall_debug.rs trivially-ordered vectors) plus structural invariants
the reference checks by querying shadow tables (tests/test_scale.rs node
counts, test_edge_counts.rs prune validation).

One module-scoped graph (400 x 64D, L2) backs most tests to keep CPU
compile/build time bounded; recall tests at 128D run their own configs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuvec.index import bruteforce_knn, HnswParams
from tpuvec.index.build import build_graph, delete_ids, insert_batch, plan_batch_sizes
from tpuvec.index.graph import allocate, config_for, prepare_vectors
from tpuvec.index.search import search
from tpuvec.types import DistanceMetric, IndexQuantization
from tpuvec.utils.prng import sample_levels, sample_levels_np

N64, D64 = 400, 64
CFG64 = config_for(
    D64,
    metric=DistanceMetric.L2,
    cap=512,
    params=HnswParams(m=8, max_m0=16, ef_construction=64, ef_search=64),
)


def copy_state(state):
    return jax.tree.map(lambda a: a.copy(), state)


def recall_at_k(found_ids, true_ids):
    hits = total = 0
    for f, t in zip(found_ids, true_ids):
        t = set(int(x) for x in t if x >= 0)
        hits += len(t & set(int(x) for x in f))
        total += len(t)
    return hits / max(total, 1)


@pytest.fixture(scope="module")
def data64():
    rng = np.random.default_rng(42)
    x = rng.standard_normal((N64, D64)).astype(np.float32)
    xp = np.asarray(prepare_vectors(CFG64, jnp.asarray(x)))
    state = build_graph(CFG64, xp, max_batch=64)
    return x, xp, state


def test_plan_batch_sizes():
    sizes = plan_batch_sizes(100, max_batch=32)
    assert sum(sizes) == 100
    assert sizes[0] == 1
    assert max(sizes) <= 32
    done = 0
    for s in sizes:
        if done > 0:
            assert s <= max(done, 32)
        done += s


def test_levels_np_jnp_agree():
    ids = np.arange(5000, dtype=np.int32)
    ln = sample_levels_np(ids, 7, 1 / np.log(32.0), 16)
    lj = np.asarray(sample_levels(jnp.asarray(ids), 7, 1 / np.log(32.0), 16))
    assert (ln == lj).mean() > 0.999
    frac = (ln >= 1).mean()
    assert 0.015 < frac < 0.06  # ~1/32 decay


def test_trivial_ordered_vectors():
    # reference test_recall_debug.rs: tiny set, nearest must be exact
    x = np.zeros((10, D64), dtype=np.float32)
    x[:, 0] = np.arange(10)
    xp = np.asarray(prepare_vectors(CFG64, jnp.asarray(x)))
    state = build_graph(CFG64, xp, max_batch=64)
    q = np.zeros((1, D64), dtype=np.float32)
    q[0, 0] = 3.1
    d, i = search(CFG64, state, prepare_vectors(CFG64, jnp.asarray(q)), k=3)
    assert list(np.asarray(i)[0]) == [3, 4, 2]
    np.testing.assert_allclose(np.asarray(d)[0], [0.1, 0.9, 1.1], atol=1e-4)


def test_recall_vs_oracle(data64):
    x, xp, state = data64
    rng = np.random.default_rng(7)
    q = rng.standard_normal((16, D64)).astype(np.float32)
    qp = prepare_vectors(CFG64, jnp.asarray(q))
    d_h, i_h = search(CFG64, state, qp, k=10)
    gt_d, gt_i = bruteforce_knn(
        qp, jnp.asarray(xp), jnp.ones(N64, bool), metric=DistanceMetric.L2, k=10
    )
    r = recall_at_k(np.asarray(i_h), np.asarray(gt_i))
    assert r >= 0.95, f"recall@10 = {r}"
    dh = np.asarray(d_h)
    assert np.all(np.diff(dh, axis=1) >= -1e-5)  # ascending user-metric dists


def test_structural_invariants(data64):
    x, xp, state = data64
    levels = np.asarray(state.levels)
    adj0 = np.asarray(state.adj0)
    assert int(state.count) == N64
    assert (levels[:N64] >= 0).all()
    assert int(state.entry_point) >= 0
    assert int(state.entry_level) == levels[int(state.entry_point)]
    assert int(state.entry_level) == levels[:N64].max()

    for i in range(N64):
        row = adj0[i][adj0[i] >= 0]
        assert len(row) <= CFG64.max_m0
        assert i not in row, f"self loop at {i}"
        assert len(set(row.tolist())) == len(row), f"duplicate edges at {i}"
        assert (levels[row] >= 0).all()
        assert len(row) > 0, f"isolated node {i}"

    # stored distances match recomputed squared L2
    dist = np.asarray(state.adj0_dist)
    for i in [0, 17, N64 - 1]:
        for j, nb in enumerate(adj0[i]):
            if nb >= 0:
                expect = ((xp[i] - xp[nb]) ** 2).sum()
                assert abs(dist[i, j] - expect) < 1e-2

    # upper graph consistency
    upper_slot = np.asarray(state.upper_slot)
    upper_nodes = np.asarray(state.upper_nodes)
    for i in range(N64):
        if levels[i] >= 1:
            s = upper_slot[i]
            assert s >= 0 and upper_nodes[s] == i


def test_reachability_and_edge_budget(data64):
    """Level-0 connectivity (BFS from the entry point must reach ~every
    node — the protected-prefix reverse prune exists exactly to prevent
    graph shattering at scale) and the edge budget the reference audits
    via shadow-table counts (tests/test_edge_counts.rs): mean out-degree
    must sit well inside (0, max_m0]."""
    _, _, state = data64
    adj0 = np.asarray(state.adj0)[:N64]
    deg = (adj0 >= 0).sum(axis=1)
    assert 2.0 <= deg.mean() <= CFG64.max_m0, deg.mean()

    # BFS over the undirected closure (search can enter a node through
    # either edge direction via the beam's candidate expansion)
    fwd = [set(r[r >= 0].tolist()) for r in adj0]
    und = [set(s) for s in fwd]
    for i, nbrs in enumerate(fwd):
        for j in nbrs:
            und[j].add(i)
    seen = {int(state.entry_point)}
    frontier = [int(state.entry_point)]
    while frontier:
        nxt = []
        for i in frontier:
            for j in und[i]:
                if j not in seen:
                    seen.add(j)
                    nxt.append(j)
        frontier = nxt
    assert len(seen) >= 0.99 * N64, f"only {len(seen)}/{N64} reachable"


def test_delete_and_research(data64):
    x, xp, state = data64
    state = copy_state(state)
    q = prepare_vectors(CFG64, jnp.asarray(x[:1]))
    _, near = search(CFG64, state, q, k=16)
    victims = np.asarray(near)[0]
    state = delete_ids(CFG64, state, jnp.asarray(victims, dtype=jnp.int32))
    assert int(state.count) == N64 - 16

    adj0 = np.asarray(state.adj0)
    for v in victims:
        assert (adj0 != v).all(), "deleted id still referenced"

    _, i2 = search(CFG64, state, q, k=10)
    found = set(np.asarray(i2)[0].tolist())
    assert found.isdisjoint(set(victims.tolist()))
    assert all(f >= 0 for f in found)


def test_delete_entry_point_reselects(data64):
    _, _, state = data64
    state = copy_state(state)
    ep = int(state.entry_point)
    state = delete_ids(CFG64, state, jnp.asarray([ep] + [-1] * 15, dtype=jnp.int32))
    new_ep = int(state.entry_point)
    levels = np.asarray(state.levels)
    assert new_ep != ep and new_ep >= 0
    assert levels[new_ep] == int(state.entry_level) == levels[levels >= 0].max()


def test_empty_and_single():
    rng = np.random.default_rng(3)
    state = allocate(CFG64)
    q = prepare_vectors(
        CFG64, jnp.asarray(rng.standard_normal((2, D64)), dtype=jnp.float32)
    )
    d, i = search(CFG64, state, q, k=3)
    assert (np.asarray(i) == -1).all()
    assert np.isinf(np.asarray(d)).all()

    # single insert through the same fixed-shape batch program
    v = np.zeros((64, CFG64.padded_dim), dtype=np.float32)
    v[0] = np.asarray(
        prepare_vectors(CFG64, jnp.asarray(rng.standard_normal((1, D64)), dtype=jnp.float32))
    )[0]
    ids = np.full(64, -1, dtype=np.int32)
    ids[0] = 0
    lv = sample_levels(
        jnp.maximum(jnp.asarray(ids), 0), CFG64.rng_seed, CFG64.level_factor, CFG64.lu
    )
    state = insert_batch(CFG64, state, jnp.asarray(ids), jnp.asarray(v), lv)
    d, i = search(CFG64, state, q, k=3)
    assert np.asarray(i)[0, 0] == 0
    assert (np.asarray(i)[:, 1:] == -1).all()
    assert int(state.count) == 1
    assert int(state.entry_point) == 0


def test_recall_cosine_128():
    # reference test_recall_cosine.rs analogue, with the normalize+L2 trick
    rng = np.random.default_rng(11)
    n, d, k = 600, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    cfg = config_for(
        d,
        metric=DistanceMetric.COSINE,
        cap=1024,
        params=HnswParams(m=16, max_m0=32, ef_construction=100, ef_search=100),
    )
    assert cfg.normalized
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(x)))
    state = build_graph(cfg, xp, max_batch=128)
    qp = prepare_vectors(cfg, jnp.asarray(q))
    d_h, i_h = search(cfg, state, qp, k=k)

    gt_d, gt_i = bruteforce_knn(
        jnp.asarray(q), jnp.asarray(x), jnp.ones(n, bool),
        metric=DistanceMetric.COSINE, k=k,
    )
    r = recall_at_k(np.asarray(i_h), np.asarray(gt_i))
    assert r >= 0.95, f"cosine recall@10 = {r}"
    # user distances are true cosine distances
    top = np.asarray(i_h)[:, 0]
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    expect = 1.0 - np.einsum("bd,bd->b", qn, xn[top])
    np.testing.assert_allclose(np.asarray(d_h)[:, 0], expect, atol=1e-4)


def test_int8_index_quantization_recall():
    # reference test_quantization_perf.rs: int8-quantized index recall >= 0.90
    rng = np.random.default_rng(5)
    n, d, k = 600, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.integers(0, n, 16)] + 0.05 * rng.standard_normal((16, d)).astype(
        np.float32
    )
    cfg = config_for(
        d,
        metric=DistanceMetric.COSINE,
        cap=1024,
        quantization=IndexQuantization.INT8,
        params=HnswParams(m=16, max_m0=32, ef_construction=100, ef_search=100),
    )
    assert cfg.store_dtype == jnp.int8
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(x)))
    state = build_graph(cfg, xp, max_batch=128)
    qp = prepare_vectors(cfg, jnp.asarray(q))
    _, i_h = search(cfg, state, qp, k=k)

    gt_d, gt_i = bruteforce_knn(
        jnp.asarray(q), jnp.asarray(x), jnp.ones(n, bool),
        metric=DistanceMetric.COSINE, k=k,
    )
    r = recall_at_k(np.asarray(i_h), np.asarray(gt_i))
    assert r >= 0.90, f"int8 recall@10 = {r}"


def test_int8_raw_cosine_recall():
    # vec_type=INT8 + COSINE stores *raw* int8 and runs 1-sim internally
    # (no normalize trick) — the config where heuristic_select's pairwise
    # matrix must be in cosine units, not L2^2 (reference int8 cosine:
    # src/vector.rs:554-575 + src/distance/scalar.rs:42-52).
    from tpuvec.types import VectorType

    rng = np.random.default_rng(9)
    n, d, k = 600, 128, 10
    x = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    q = x[rng.integers(0, n, 16)].astype(np.float32)
    q += 5.0 * rng.standard_normal((16, d)).astype(np.float32)
    q = np.clip(np.trunc(q), -128, 127).astype(np.int8)
    cfg = config_for(
        d,
        metric=DistanceMetric.COSINE,
        vec_type=VectorType.INT8,
        cap=1024,
        params=HnswParams(m=16, max_m0=32, ef_construction=100, ef_search=100),
    )
    assert not cfg.normalized and cfg.graph_metric is DistanceMetric.COSINE
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(x)))
    state = build_graph(cfg, xp, max_batch=128)
    qp = prepare_vectors(cfg, jnp.asarray(q))
    _, i_h = search(cfg, state, qp, k=k)

    gt_d, gt_i = bruteforce_knn(
        jnp.asarray(q, dtype=jnp.float32),
        jnp.asarray(x, dtype=jnp.float32),
        jnp.ones(n, bool),
        metric=DistanceMetric.COSINE,
        k=k,
    )
    r = recall_at_k(np.asarray(i_h), np.asarray(gt_i))
    assert r >= 0.95, f"raw-cosine int8 recall@10 = {r}"


def test_l1_graph_recall():
    # L1 graphs use L1 internal distances; the diversity heuristic's
    # candidate-pairwise matrix must be L1 too (reference L1 kernel:
    # src/distance/scalar.rs:25-38).
    rng = np.random.default_rng(13)
    n, d, k = 600, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    cfg = config_for(
        d,
        metric=DistanceMetric.L1,
        cap=1024,
        params=HnswParams(m=16, max_m0=32, ef_construction=100, ef_search=100),
    )
    assert cfg.graph_metric is DistanceMetric.L1
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(x)))
    state = build_graph(cfg, xp, max_batch=128)
    qp = prepare_vectors(cfg, jnp.asarray(q))
    d_h, i_h = search(cfg, state, qp, k=k)

    gt_d, gt_i = bruteforce_knn(
        jnp.asarray(q), jnp.asarray(x), jnp.ones(n, bool),
        metric=DistanceMetric.L1, k=k,
    )
    r = recall_at_k(np.asarray(i_h), np.asarray(gt_i))
    assert r >= 0.95, f"L1 recall@10 = {r}"
    # user distances are true L1
    top = np.asarray(i_h)[:, 0]
    expect = np.abs(q - x[top]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(d_h)[:, 0], expect, rtol=1e-4)


def test_upper_capacity_overflow_demotes_to_level0():
    """When the compact upper pool (cap_u) fills, overflowing nodes must
    demote to level 0 (build.py _stage_write) without breaking search:
    they stay reachable through level-0 edges."""
    import dataclasses

    rng = np.random.default_rng(9)
    n, d = 300, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    cfg = dataclasses.replace(
        config_for(
            d,
            metric=DistanceMetric.L2,
            cap=512,
            params=HnswParams(m=4, max_m0=8, ef_construction=48, ef_search=48),
        ),
        cap_u=4,  # force overflow: ~n/m ≈ 75 nodes want upper slots
    )
    xp = np.asarray(prepare_vectors(cfg, jnp.asarray(x)))
    state = build_graph(cfg, xp, max_batch=64)

    up_cnt = int(state.upper_count)
    assert up_cnt <= 4
    levels = np.asarray(state.levels)[:n]
    slots = np.asarray(state.upper_slot)[:n]
    # every node with level >= 1 holds a real upper slot; all others were
    # demoted to level 0 (not dropped)
    assert (levels >= 0).all()
    assert ((levels >= 1) == (slots >= 0)).all()
    assert (levels >= 1).sum() == up_cnt
    # entry point is live and self-consistent
    ep = int(state.entry_point)
    assert levels[ep] == int(state.entry_level)

    # search still works despite the crippled hierarchy; a flat graph
    # with 4 upper nodes legitimately loses some descent quality (0.8
    # self-hit measured vs ~1.0 healthy), so the bar here is only
    # "demotion didn't disconnect anything catastrophically"
    qp = prepare_vectors(cfg, jnp.asarray(x[:64]))
    _, i_h = search(cfg, state, qp, k=1, ef=48)
    self_hit = (np.asarray(i_h)[:, 0] == np.arange(64)).mean()
    assert self_hit >= 0.7


def test_apply_rows_dense_matches_scatter(data64, monkeypatch):
    """The scatter-free reverse-apply (searchsorted + dense select) must
    be row-for-row identical to the scatter form on real _reverse_compute
    output, and an end-to-end build through the env dispatch must produce
    the same graph."""
    from tpuvec.index import build as B

    x, xp, state = data64
    # real reverse-pass inputs: forward edges of a fresh mini-batch
    rng = np.random.default_rng(7)
    nb, m0 = 32, CFG64.max_m0
    fwd_i = rng.integers(0, N64, size=(nb, m0)).astype(np.int32)
    fwd_i[rng.random((nb, m0)) < 0.2] = -1  # padding holes
    fwd_d = np.abs(rng.standard_normal((nb, m0))).astype(np.float32)
    fwd_d[fwd_i < 0] = np.inf
    new_ids = np.arange(N64, N64 + nb, dtype=np.int32)
    ok_new = np.ones(nb, dtype=bool)
    ok_new[-3:] = False  # padded tail rows
    protect = min(CFG64.m, CFG64.max_m0 // 2)
    rev = B._reverse_compute(
        state.adj0, state.adj0_dist, jnp.asarray(new_ids),
        jnp.asarray(fwd_i), jnp.asarray(fwd_d), jnp.asarray(ok_new),
        CFG64.cap, CFG64.max_m0, protect,
    )
    a_s, d_s = B._apply_rows(
        state.adj0.copy(), state.adj0_dist.copy(), *rev, protect=protect
    )
    a_d, d_d = B._apply_rows_dense(
        state.adj0.copy(), state.adj0_dist.copy(), *rev, protect=protect
    )
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_d))
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_d))

    # dispatch: dense is the default under the byte threshold, scatter
    # above it (the dense program's [cap, m0] temps OOM huge caps), and
    # TPUVEC_REV_APPLY forces either unconditionally
    monkeypatch.delenv("TPUVEC_REV_APPLY", raising=False)
    assert B._apply_rows_impl() is B._apply_rows_dense
    assert B._apply_rows_impl(1 << 33) is B._apply_rows
    monkeypatch.setenv("TPUVEC_REV_APPLY", "dense")
    assert B._apply_rows_impl(1 << 33) is B._apply_rows_dense

    # env dispatch: full builds agree bit-for-bit
    monkeypatch.setenv("TPUVEC_REV_APPLY", "scatter")
    assert B._apply_rows_impl() is B._apply_rows
    g_scatter = build_graph(CFG64, xp[:200], max_batch=64)
    monkeypatch.setenv("TPUVEC_REV_APPLY", "dense")
    g_dense = build_graph(CFG64, xp[:200], max_batch=64)
    np.testing.assert_array_equal(
        np.asarray(g_scatter.adj0), np.asarray(g_dense.adj0)
    )
    np.testing.assert_array_equal(
        np.asarray(g_scatter.adj0_dist), np.asarray(g_dense.adj0_dist)
    )


def test_heuristic_select_matches_canonical_scan():
    # heuristic_select runs a next-survivor loop of max_conn steps; it must
    # produce exactly the canonical per-candidate scan's kept set (walk
    # candidates ascending, keep c iff closer to the new node than to every
    # already-kept neighbor) plus the closest rejected fill, i.e. the
    # reference's RNG heuristic semantics (src/hnsw/mod.rs:29-32).
    from tpuvec.index.build import heuristic_select

    rng = np.random.default_rng(11)
    nb, c, d, max_conn = 8, 48, 32, 8
    cfg = config_for(d, metric=DistanceMetric.L2, cap=256)
    cvecs = rng.standard_normal((nb, c, cfg.padded_dim)).astype(np.float32)
    cvecs[:, :, d:] = 0.0
    base = rng.standard_normal((nb, cfg.padded_dim)).astype(np.float32)
    base[:, d:] = 0.0
    cand_d = np.sum((cvecs - base[:, None, :]) ** 2, axis=-1)
    order = np.argsort(cand_d, axis=1)
    cand_d = np.take_along_axis(cand_d, order, axis=1)
    cvecs = np.take_along_axis(cvecs, order[:, :, None], axis=1)
    cand_i = rng.permutation(nb * c).reshape(nb, c).astype(np.int32)
    # a few invalid tail slots
    cand_d[:, -3:] = np.inf
    cand_i[:, -3:] = -1

    sel_d, sel_i = heuristic_select(
        cfg, jnp.asarray(cand_d), jnp.asarray(cand_i),
        jnp.asarray(cvecs), max_conn,
    )
    sel_i = np.asarray(sel_i)

    pair = np.sum(
        (cvecs[:, :, None, :] - cvecs[:, None, :, :]) ** 2, axis=-1
    )
    for b in range(nb):
        kept: list[int] = []
        for j in range(c):
            if not np.isfinite(cand_d[b, j]) or len(kept) >= max_conn:
                continue
            if all(cand_d[b, j] < pair[b, i, j] for i in kept):
                kept.append(j)
        rejected = [
            j for j in range(c)
            if j not in kept and np.isfinite(cand_d[b, j])
        ]
        want = (kept + rejected)[:max_conn]
        want_ids = [int(cand_i[b, j]) for j in want]
        want_ids += [-1] * (max_conn - len(want_ids))
        assert sel_i[b].tolist() == want_ids, (b, sel_i[b].tolist(), want_ids)
