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
