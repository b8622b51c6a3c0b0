"""BASELINE config 3: int8[1024]-quantized cosine at 1M vectors.

The index stores int8 symmetric-quantized copies (4x memory saving,
reference vec_quantize_int8 path, /root/reference/src/vector.rs:554-575);
ground truth is FULL-f32 cosine. The coarse int8 graph search caps at
~0.90 recall (quantization error — the reference asserts the same >=0.90,
tests/test_quantization_perf.rs:246-250); a device-side f32 rerank
(ops/rerank.py) over the coarse top-C lifts it back above 0.95.
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tpuvec.index import HnswParams
from tpuvec.index.bruteforce import bruteforce_knn
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.ops.rerank import rerank_topk
from tpuvec.types import DistanceMetric, IndexQuantization
from tpuvec.utils.data import synthetic_embeddings
from tpuvec.utils.safecache import enable_atomic_cache_writes
from tpuvec.utils.transfer import prepare_vectors_device, to_device_chunked

enable_atomic_cache_writes()

n, d, k, qn, reps = 1_000_000, 1024, 10, 256, 5
print("generating...", flush=True)
data = synthetic_embeddings(n + qn * (reps + 1), d, n_clusters=1024, seed=3)
x, qpool = data[:n], data[n:]
q = qpool[:qn]
params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
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
rep_qs = [
    prepare_vectors(cfg, jnp.asarray(qpool[(i + 1) * qn : (i + 2) * qn]))
    for i in range(reps)
]
jax.block_until_ready(rep_qs)
# ground truth in FULL f32 cosine (what the user cares about)
xf = to_device_chunked(x)
gt_i = np.asarray(
    bruteforce_knn(jnp.asarray(q), xf, jnp.ones(n, bool), metric=DistanceMetric.COSINE, k=k)[1]
)

def recall(found):
    return sum(len(set(found[b].tolist()) & set(gt_i[b].tolist())) for b in range(qn)) / (qn * k)

# f32 shadow for device rerank (4 GB; coexists with the 1 GB int8 index)
qf = jnp.asarray(q)

print("--- coarse int8 graph search ---", flush=True)
for ef, mi in ((16, None), (32, None), (48, 56), (64, 64), (128, None)):
    d_h, i_h = search_graph(cfg, state, qp, k=k, ef=ef, max_iters=mi)
    i_h.block_until_ready()
    t0 = time.time()
    outs = [
        search_graph(cfg, state, rep_qs[i], k=k, ef=ef, max_iters=mi)[1]
        for i in range(reps)
    ]
    jax.block_until_ready(outs)
    dt = (time.time()-t0)/reps
    print(f"ef={ef} iters={mi} recall={recall(np.asarray(i_h)):.4f} {dt*1e3:.1f} ms/batch {qn/dt:.0f} QPS", flush=True)

print("--- int8 coarse + device f32 rerank (top-C from ef-wide beam) ---", flush=True)
for ef, mi, c in ((48, 56, 40), (64, 64, 48), (128, None, 96)):
    def run(qq, qqf):
        dd, ii = search_graph(cfg, state, qq, k=c, ef=ef, max_iters=mi)
        return rerank_topk(xf, ii, ii >= 0, qqf, metric=DistanceMetric.COSINE, k=k)
    d_h, i_h = run(qp, qf)
    i_h.block_until_ready()
    t0 = time.time()
    outs = []
    for i in range(reps):
        qif = jnp.asarray(qpool[(i + 1) * qn : (i + 2) * qn])
        outs.append(run(rep_qs[i], qif)[1])
    jax.block_until_ready(outs)
    dt = (time.time()-t0)/reps
    print(f"ef={ef} iters={mi} C={c} recall={recall(np.asarray(i_h)):.4f} {dt*1e3:.1f} ms/batch {qn/dt:.0f} QPS", flush=True)
