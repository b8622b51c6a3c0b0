"""Concurrency stress test: threaded inserts + searches on one VecTable.

Analogue of the reference's tests/test_multithread_stress.rs (12 insert +
8 search threads over one WAL-mode SQLite file). tpuvec serializes device
mutation behind the table RLock (the reference serializes writers behind
SQLite's write lock) while readers interleave; the test asserts zero
errors, consistent counts, and a passing integrity check — the same exit
criteria as STRESS_TEST_BASELINE.md.
"""

import threading

import numpy as np

from tpuvec.index.params import HnswParams
from tpuvec.store import ColumnSpec, VecTable
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings

PARAMS = HnswParams(m=8, max_m0=16, ef_construction=48, ef_search=48)


def test_threaded_insert_and_search():
    d = 32
    x = synthetic_embeddings(600, d, intrinsic_dim=12, n_clusters=24, seed=9)
    t = VecTable(
        "stress",
        [ColumnSpec.vector("emb", d, metric=DistanceMetric.L2, params=PARAMS)],
        initial_cap=1024,
    )
    # warm start so searches have something to find
    t.insert_many([{"emb": v} for v in x[:100]])

    errors: list[Exception] = []
    inserted: dict[int, int] = {}  # rowid -> index into x
    ins_lock = threading.Lock()
    n_writers, n_readers = 4, 4
    per_writer = 100

    def writer(wid: int):
        try:
            for j in range(per_writer):
                idx = 100 + wid * per_writer + j
                rid = t.insert({"emb": x[idx]})
                with ins_lock:
                    inserted[rid] = idx
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader(rid: int):
        try:
            rng = np.random.default_rng(rid)
            for _ in range(15):
                probe = x[rng.integers(0, 100)]
                res = t.knn("emb", probe, k=5)
                assert res, "search returned nothing"
                assert all(r.rowid >= 1 for r in res)
                ds = [r.distance for r in res]
                assert ds == sorted(ds)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    threads += [threading.Thread(target=reader, args=(i,)) for i in range(n_readers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errors, errors
    t.flush()
    assert len(t) == 100 + n_writers * per_writer
    assert len(inserted) == n_writers * per_writer  # all rowids distinct
    assert t.integrity_check() == []
    # auto-rowids interleave across writers; verify by the recorded mapping:
    # every inserted row is findable as its own nearest neighbor
    for rid in list(inserted)[:: len(inserted) // 10]:
        res = t.knn("emb", x[inserted[rid]], k=1)
        assert res[0].rowid == rid
        assert res[0].distance < 1e-3
