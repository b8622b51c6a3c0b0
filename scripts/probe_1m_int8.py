"""BASELINE config 3: int8[1024]-quantized cosine at 1M vectors."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tpuvec.index import HnswParams
from tpuvec.index.bruteforce import bruteforce_knn
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.types import DistanceMetric, IndexQuantization
from tpuvec.utils.data import synthetic_embeddings
from tpuvec.utils.transfer import prepare_vectors_device, to_device_chunked

n, d, k, qn = 1_000_000, 1024, 10, 256
print("generating...", flush=True)
data = synthetic_embeddings(n + qn, d, n_clusters=1024, seed=3)
x, q = data[:n], data[n:]
params = HnswParams(m=32, max_m0=64, ef_construction=200, ef_search=128)
cfg = config_for(
    d, metric=DistanceMetric.COSINE, quantization=IndexQuantization.INT8,
    params=params, cap=n,
)
assert cfg.store_dtype == jnp.int8
t0 = time.time()
xp_dev = prepare_vectors_device(cfg, x)   # int8 index copies, 1 GB, on device
print(f"prepared in {time.time()-t0:.0f}s ({xp_dev.nbytes/2**20:.0f} MiB int8)", flush=True)
t0 = time.time()
state = build_graph(cfg, xp_dev, max_batch=1024, progress=100)
state.count.block_until_ready()
bs = time.time() - t0
print(f"build: {n} in {bs:.0f}s = {n/bs:.0f} vec/s", flush=True)

qp = prepare_vectors(cfg, jnp.asarray(q))
# ground truth in FULL f32 cosine (what the user cares about)
xf = to_device_chunked(x)
gt_i = np.asarray(
    bruteforce_knn(jnp.asarray(q), xf, jnp.ones(n, bool), metric=DistanceMetric.COSINE, k=k)[1]
)
del xf
def recall(found):
    return sum(len(set(found[b].tolist()) & set(gt_i[b].tolist())) for b in range(qn)) / (qn * k)
for ef in (16, 32, 64, 128):
    d_h, i_h = search_graph(cfg, state, qp, k=k, ef=ef)
    i_h.block_until_ready()
    t0 = time.time(); reps = 10
    for _ in range(reps):
        d_h, i_h = search_graph(cfg, state, qp, k=k, ef=ef)
    i_h.block_until_ready()
    dt = (time.time()-t0)/reps
    print(f"ef={ef} recall={recall(np.asarray(i_h)):.4f} {dt*1e3:.1f} ms/batch {qn/dt:.0f} QPS", flush=True)
