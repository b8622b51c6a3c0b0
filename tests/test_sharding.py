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
