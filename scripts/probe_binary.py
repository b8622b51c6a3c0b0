"""BASELINE config 4: binary[1024] Hamming coarse search + f32 rerank.

Corpus size via TPUVEC_PROBE_N (default 2M; the BASELINE config is 10M —
same code path, linear scaling). The f32 originals stay on HOST (40 GB at
10M); rerank gathers candidate rows host-side, exactly as VecTable's
binary path does.
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpuvec.index import HnswParams
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search_graph
from tpuvec.types import DistanceMetric, IndexQuantization
from tpuvec.utils.data import synthetic_embeddings
from tpuvec.utils.transfer import prepare_vectors_chunked

n = int(os.environ.get("TPUVEC_PROBE_N", 2_000_000))
d, k, qn, coarse_k = 1024, 10, 256, 128
print(f"generating {n} x {d}...", flush=True)
data = synthetic_embeddings(n + qn, d, n_clusters=2048, seed=4)
x, q = data[:n], data[n:]

params = HnswParams(m=32, max_m0=64, ef_construction=200, ef_search=128)
cfg = config_for(
    d, metric=DistanceMetric.COSINE, quantization=IndexQuantization.BINARY,
    params=params, cap=n,
)
assert cfg.store_dtype == jnp.uint32
t0 = time.time()
xp_host = prepare_vectors_chunked(cfg, x)  # packed sign bits
print(f"packed in {time.time()-t0:.0f}s ({xp_host.nbytes/2**20:.0f} MiB)", flush=True)

t0 = time.time()
state = build_graph(cfg, xp_host, max_batch=1024)
state.count.block_until_ready()
bs = time.time() - t0
print(f"build: {n} in {bs:.0f}s = {n/bs:.0f} vec/s", flush=True)

qp = prepare_vectors(cfg, jnp.asarray(q))

# f32 cosine ground truth, computed in device chunks against host corpus
xn = x / np.linalg.norm(x, axis=1, keepdims=True)
qnorm = q / np.linalg.norm(q, axis=1, keepdims=True)
best_d = np.full((qn, k), np.inf, np.float32)
best_i = np.full((qn, k), -1, np.int64)
qd = jnp.asarray(qnorm)
CH = 250_000
for s0 in range(0, n, CH):
    blk = jnp.asarray(xn[s0 : s0 + CH])
    sims = np.asarray(jnp.dot(qd, blk.T, preferred_element_type=jnp.float32))
    dist = 1.0 - sims
    ids = np.argsort(dist, axis=1)[:, :k]
    dd = np.take_along_axis(dist, ids, 1)
    alld = np.concatenate([best_d, dd], 1)
    alli = np.concatenate([best_i, ids + s0], 1)
    order = np.argsort(alld, axis=1)[:, :k]
    best_d = np.take_along_axis(alld, order, 1)
    best_i = np.take_along_axis(alli, order, 1)
gt = best_i
print("ground truth done", flush=True)

def run(ef):
    d_h, i_h = search_graph(cfg, state, qp, k=coarse_k, ef=max(ef, coarse_k))
    i_h.block_until_ready()
    t0 = time.time(); reps = 5
    for _ in range(reps):
        d_h, i_h = search_graph(cfg, state, qp, k=coarse_k, ef=max(ef, coarse_k))
    i_h.block_until_ready()
    coarse_dt = (time.time() - t0) / reps
    # host rerank in exact f32 cosine
    t0 = time.time()
    cands = np.asarray(i_h)
    found = np.full((qn, k), -1, np.int64)
    for b in range(qn):
        cc = cands[b][cands[b] >= 0]
        dd = 1.0 - xn[cc] @ qnorm[b]
        found[b, : min(k, cc.size)] = cc[np.argsort(dd)[:k]]
    rerank_dt = time.time() - t0
    rec = sum(len(set(found[b]) & set(gt[b])) for b in range(qn)) / (qn * k)
    total = coarse_dt + rerank_dt
    print(
        f"ef={ef} coarse_k={coarse_k} recall@10={rec:.4f} "
        f"coarse {coarse_dt*1e3:.1f} ms + rerank {rerank_dt*1e3:.1f} ms "
        f"= {qn/total:.0f} QPS",
        flush=True,
    )

for ef in (128, 192, 256):
    run(ef)
