"""North-star probe: 1M x 768 f32 cosine on one chip (BASELINE.json)."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tpuvec.index import HnswParams, bruteforce_knn
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings

n, d, k, qn = 1_000_000, 768, 10, 256
print("generating data...", flush=True)
data = synthetic_embeddings(n + qn, d, n_clusters=1024, seed=0)
x, q = data[:n], data[n:]
params = HnswParams(m=32, max_m0=64, ef_construction=200, ef_search=128)
cfg = config_for(d, metric=DistanceMetric.COSINE, params=params, cap=n)
from tpuvec.utils.transfer import prepare_vectors_device
t0 = time.time()
xp_dev = prepare_vectors_device(cfg, x)
print(f"prepared in {time.time()-t0:.0f}s (device-resident)", flush=True)
t0 = time.time()
state = build_graph(cfg, xp_dev, max_batch=1024, progress=50)
state.count.block_until_ready()
bs = time.time() - t0
print(f"build: {n} in {bs:.0f}s = {n/bs:.0f} vec/s", flush=True)

qp = prepare_vectors(cfg, jnp.asarray(q))
gt_i = np.asarray(bruteforce_knn(qp, xp_dev, jnp.ones(n, bool), metric=cfg.graph_metric, k=k, normalized=cfg.normalized)[1])
del xp_dev
def recall(found):
    return sum(len(set(found[b].tolist()) & set(gt_i[b].tolist())) for b in range(qn)) / (qn*k)
for ef in (16, 32, 64, 128):
    d_h, i_h = search_graph(cfg, state, qp, k=k, ef=ef)
    i_h.block_until_ready()
    t0 = time.time(); reps = 10
    for _ in range(reps):
        d_h, i_h = search_graph(cfg, state, qp, k=k, ef=ef)
    i_h.block_until_ready()
    dt = (time.time()-t0)/reps
    print(f"ef={ef} recall={recall(np.asarray(i_h)):.4f} {dt*1e3:.1f} ms/batch {qn/dt:.0f} QPS", flush=True)
