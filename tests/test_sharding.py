"""Mesh-sharding tests on the 8-virtual-device CPU mesh.

The reference's closest analogues: partition keys (parsed, unimplemented —
src/vtab.rs:854-859) and multi-connection concurrency
(tests/test_multithread_stress.rs). Here: per-shard sub-indexes under
shard_map with an all-gather top-k merge must match a single-index oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuvec.index import bruteforce_knn, HnswParams
from tpuvec.parallel import ShardedHnsw, make_mesh
from tpuvec.types import DistanceMetric

PARAMS = HnswParams(m=8, max_m0=16, ef_construction=64, ef_search=64)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_recall(mesh):
    rng = np.random.default_rng(0)
    n, d, k = 800, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)

    idx = ShardedHnsw(
        mesh, d, metric=DistanceMetric.L2, params=PARAMS, cap_per_shard=256
    )
    gids = idx.add(x, batch=32)
    assert len(set(gids.tolist())) == n

    d_s, i_s = idx.search(q, k=k)
    gt_d, gt_i = bruteforce_knn(
        jnp.asarray(q), jnp.asarray(x), jnp.ones(n, bool),
        metric=DistanceMetric.L2, k=k,
    )
    # map oracle row indices -> global ids
    hits = total = 0
    for b in range(q.shape[0]):
        want = {int(gids[j]) for j in np.asarray(gt_i)[b]}
        got = set(int(g) for g in np.asarray(i_s)[b] if g >= 0)
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.95, f"sharded recall@10 = {recall}"
    # merged distances ascending
    assert np.all(np.diff(np.asarray(d_s), axis=1) >= -1e-5)


def test_partition_affinity_and_routing(mesh):
    rng = np.random.default_rng(1)
    n, d = 400, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    tenants = (np.arange(n) % 10).tolist()

    idx = ShardedHnsw(
        mesh, d, metric=DistanceMetric.L2, params=PARAMS, cap_per_shard=256
    )
    gids = idx.add(x, partitions=tenants, batch=32)

    # all rows of one tenant land on the tenant's shard
    cap = idx.config.cap
    for t in range(10):
        shard = idx.shard_of_partition(t)
        rows = [i for i in range(n) if tenants[i] == t]
        assert all(gids[r] // cap == shard for r in rows)

    # partition-scoped query returns only that tenant's rows
    probe = x[tenants.index(3)]
    d_s, i_s = idx.search(probe[None], k=5, partition=3)
    got = [int(g) for g in np.asarray(i_s)[0] if g >= 0]
    assert got, "partition query returned nothing"
    tenant3 = {int(gids[r]) for r in range(n) if tenants[r] == 3}
    assert set(got) <= tenant3
    # the probe itself is the nearest
    assert got[0] == int(gids[tenants.index(3)])


def test_sharded_snapshot_roundtrip(mesh, tmp_path):
    from tpuvec.parallel.sharding import load_sharded, save_sharded

    rng = np.random.default_rng(5)
    n, d = 200, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    tenants = (np.arange(n) % 5).tolist()
    idx = ShardedHnsw(mesh, d, metric=DistanceMetric.L2, params=PARAMS, cap_per_shard=128)
    gids = idx.add(x, partitions=tenants, batch=32)

    q = x[:4]
    d1, i1 = idx.search(q, k=5)
    path = str(tmp_path / "shard.npz")
    save_sharded(idx, path)
    idx2 = load_sharded(path, mesh)
    d2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
    # partition routing survives
    d3, i3 = idx2.search(x[tenants.index(2)][None], k=3, partition=2)
    got = [int(g) for g in np.asarray(i3)[0] if g >= 0]
    tenant2 = {int(gids[r]) for r in range(n) if tenants[r] == 2}
    assert got and set(got) <= tenant2


def test_update_preserves_partition_codes(mesh):
    """update() without `partitions` must keep tenant membership: delete()
    clears the per-slot codes and update must restore them (advisor
    round 2, medium)."""
    rng = np.random.default_rng(7)
    n, d = 100, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    tenants = (np.arange(n) % 4).tolist()
    idx = ShardedHnsw(
        mesh, d, metric=DistanceMetric.L2, params=PARAMS, cap_per_shard=64
    )
    gids = idx.add(x, partitions=tenants, batch=32)

    # update a few tenant-2 rows in place, no partitions argument
    rows = [r for r in range(n) if tenants[r] == 2][:3]
    new_vecs = rng.standard_normal((len(rows), d)).astype(np.float32)
    idx.update(gids[rows], new_vecs)

    d_s, i_s = idx.search(new_vecs[0][None], k=3, partition=2)
    got = [int(g) for g in np.asarray(i_s)[0] if g >= 0]
    assert int(gids[rows[0]]) in got, "updated row vanished from its partition"
    tenant2 = {int(gids[r]) for r in range(n) if tenants[r] == 2}
    assert set(got) <= tenant2


def test_thousand_partitions(mesh):
    # BASELINE config 5 shape: 1K partition keys routed across the mesh
    rng = np.random.default_rng(11)
    n, d, n_parts = 2000, 16, 1000
    x = rng.standard_normal((n, d)).astype(np.float32)
    tenants = (np.arange(n) % n_parts).tolist()
    idx = ShardedHnsw(
        mesh, d, metric=DistanceMetric.L2,
        params=HnswParams(m=4, max_m0=8, ef_construction=16, ef_search=16),
        cap_per_shard=512,
    )
    gids = idx.add(x, partitions=tenants, batch=64)
    # each tenant's rows co-locate on its shard
    cap = idx.config.cap
    for t in (0, 137, 999):
        shard = idx.shard_of_partition(t)
        rows = [i for i in range(n) if tenants[i] == t]
        assert rows and all(gids[r] // cap == shard for r in rows)
    # filtered queries return only the tenant's rows (2 rows per tenant)
    for t in (3, 512, 998):
        probe = x[tenants.index(t)]
        _, ids = idx.search(probe[None], k=2, partition=t)
        got = {int(g) for g in np.asarray(ids)[0] if g >= 0}
        want = {int(gids[r]) for r in range(n) if tenants[r] == t}
        assert got == want


def test_sharded_delete_update_churn(mesh):
    """CRUD parity on the sharded index (mirrors tests/test_table.py's
    churn test; VecTable semantics per src/vtab.rs:1326-1407,1860-2016)."""
    rng = np.random.default_rng(7)
    n, d, k = 400, 32, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedHnsw(
        mesh, d, metric=DistanceMetric.L2, params=PARAMS, cap_per_shard=128
    )
    gids = idx.add(x, batch=32)
    assert len(idx) == n

    # delete a third
    dead = gids[::3]
    idx.delete(dead)
    assert len(idx) == n - dead.size
    with pytest.raises(KeyError):
        idx.delete([int(dead[0])])
    # deleted ids never come back from search
    d_s, i_s = idx.search(x[:16], k=k)
    live_set = set(int(g) for j, g in enumerate(gids) if j % 3 != 0)
    for b in range(16):
        got = [int(g) for g in np.asarray(i_s)[b] if g >= 0]
        assert got and set(got) <= live_set
        if b % 3 != 0:
            assert int(gids[b]) in got  # self-query still finds itself

    # slots recycle: new adds reuse freed capacity (round-robin routing
    # may not land exactly on the shards with free slots, so only most
    # ids recycle) and never collide with live rows
    y = rng.standard_normal((dead.size, d)).astype(np.float32)
    gids2 = idx.add(y, batch=32)
    assert len(idx) == n
    assert not (set(gids2.tolist()) & live_set)
    recycled = len(set(gids2.tolist()) & set(dead.tolist()))
    assert recycled >= dead.size // 2

    # update in place: same gid now answers for the new vector
    upd = gids2[:8]
    z = rng.standard_normal((8, d)).astype(np.float32)
    idx.update(upd, z)
    d_u, i_u = idx.search(z, k=1)
    got = [int(g) for g in np.asarray(i_u)[:, 0]]
    assert got == [int(g) for g in upd]


def test_sharded_partition_crud_and_snapshot(mesh, tmp_path):
    from tpuvec.parallel import save_sharded, load_sharded

    rng = np.random.default_rng(8)
    n, d = 300, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    tenants = [f"t{i % 6}" for i in range(n)]
    idx = ShardedHnsw(
        mesh, d, metric=DistanceMetric.L2,
        params=HnswParams(m=4, max_m0=8, ef_construction=16, ef_search=16),
        cap_per_shard=256,
    )
    gids = idx.add(x, partitions=tenants, batch=32)
    # delete one tenant's rows entirely
    rows_t3 = [i for i in range(n) if tenants[i] == "t3"]
    idx.delete(gids[rows_t3])
    _, i_s = idx.search(x[rows_t3[0]][None], k=3, partition="t3")
    assert all(g < 0 for g in np.asarray(i_s)[0])  # tenant gone

    path = str(tmp_path / "sharded.npz")
    save_sharded(idx, path)
    idx2 = load_sharded(path, mesh)
    assert len(idx2) == len(idx)
    # partition filters survive the roundtrip
    _, i1 = idx.search(x[:4], k=3, partition="t1")
    _, i2 = idx2.search(x[:4], k=3, partition="t1")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # free slots survive: partition-routed adds after load recycle the
    # tenant's freed slots exactly
    y = rng.standard_normal((len(rows_t3), d)).astype(np.float32)
    gids2 = idx2.add(y, partitions=["t3"] * len(rows_t3), batch=32)
    assert set(gids2.tolist()) == set(gids[rows_t3].tolist())


def test_save_sharded_rejects_non_json_partition(mesh, tmp_path):
    from tpuvec.parallel import save_sharded

    rng = np.random.default_rng(9)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    idx = ShardedHnsw(
        mesh, 16, metric=DistanceMetric.L2,
        params=HnswParams(m=4, max_m0=8, ef_construction=16, ef_search=16),
        cap_per_shard=64,
    )
    idx.add(x, partitions=[b"blob"] * 8, batch=8)  # bytes: hashable, not JSON
    with pytest.raises(ValueError, match="JSON-serializable"):
        save_sharded(idx, str(tmp_path / "bad.npz"))
