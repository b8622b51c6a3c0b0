"""Direct index API + recall measurement (mirrors the reference's
examples/similarity_search.rs, which drives search_hnsw directly)."""

import time

import numpy as np
import jax.numpy as jnp

from tpuvec.index import HnswParams, bruteforce_knn
from tpuvec.index.build import build_graph
from tpuvec.index.graph import config_for, prepare_vectors
from tpuvec.index.search import search
from tpuvec.types import DistanceMetric
from tpuvec.utils.data import synthetic_embeddings


def main() -> None:
    n, d, k, qn = 10_000, 384, 10, 64
    data = synthetic_embeddings(n + qn, d, seed=0)
    x, q = data[:n], data[n:]

    cfg = config_for(
        d,
        metric=DistanceMetric.COSINE,
        params=HnswParams(m=16, max_m0=32, ef_construction=128, ef_search=64),
        cap=n,
    )
    xp = prepare_vectors(cfg, jnp.asarray(x))
    t0 = time.time()
    state = build_graph(cfg, np.asarray(xp), max_batch=512)
    state.count.block_until_ready()
    print(f"built {n} vectors in {time.time() - t0:.1f}s")

    qp = prepare_vectors(cfg, jnp.asarray(q))
    d_h, i_h = search(cfg, state, qp, k=k)

    gt_d, gt_i = bruteforce_knn(
        jnp.asarray(q), jnp.asarray(x), jnp.ones(n, bool),
        metric=DistanceMetric.COSINE, k=k,
    )
    found, want = np.asarray(i_h), np.asarray(gt_i)
    hits = sum(len(set(found[b]) & set(want[b])) for b in range(qn))
    print(f"recall@{k} = {hits / (qn * k):.4f}")
    print("sample result:", list(zip(found[0][:5], np.asarray(d_h)[0][:5])))


if __name__ == "__main__":
    main()
