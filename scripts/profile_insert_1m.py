"""Per-stage insert breakdown at 1M scale (round-3 build-rate hunt).

The 64-iteration construction-beam cap bought no build rate at 1M (636
vs 643 vec/s) while the same cap was +46% at 100K — so at 1M the cost
must sit outside the candidates beam. This resumes the 1M bench
checkpoint, inserts a few fresh batches with the timing instrumentation
on (utils/timing wraps each of the four insert stages with
block_until_ready), and prints the per-stage wall-clock breakdown.

Usage: python scripts/profile_insert_1m.py [n_batches]
Env knobs:
  TPUVEC_PROFILE_BATCH   insert batch size (default 1024) — for the
                         max_batch amortization A/B (2048/4096)
  TPUVEC_PROFILE_TIMING  0 disables the per-stage breakdown (stage syncs
                         serialize the pipeline; off = true marginal rate)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tpuvec.index import HnswParams
from tpuvec.index.build import insert_batch
from tpuvec.index.graph import GraphState, config_for
from tpuvec.types import DistanceMetric
from tpuvec.utils import timing
from tpuvec.utils.data import synthetic_embeddings
from tpuvec.utils.prng import sample_levels
from tpuvec.utils.safecache import enable_atomic_cache_writes
from tpuvec.utils.transfer import prepare_vectors_device

enable_atomic_cache_writes()

N, D = 1_000_000, 768
BATCH = int(os.environ.get("TPUVEC_PROFILE_BATCH", 1024))
TIMING = os.environ.get("TPUVEC_PROFILE_TIMING", "1") == "1"
CKPT = f"/tmp/tpuvec_bench_{N}x{D}.npz"
_CKPT_FIELDS = [
    "adj0", "adj0_dist", "levels", "upper_slot", "upper_nodes",
    "upper_adj", "upper_dist", "entry_point", "entry_level", "count",
    "upper_count",
]


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
    with open(CKPT + ".json") as f:
        pos = int(json.load(f)["pos"])
    # rebuild the vectors array exactly like bench._restore_state
    # (reuse bench.py's /tmp dataset cache when present: regeneration is
    # ~5 min of single-core CPU)
    n_clusters = 1024 if N >= 500_000 else 256
    cache = f"/tmp/tpuvec_data_{N + 256 * 6}x{D}_c{n_clusters}_s0.npy"
    if os.path.exists(cache):
        x = np.load(cache, mmap_mode="r")[:N]
    else:
        x = synthetic_embeddings(N, D, n_clusters=n_clusters, seed=0)
    xp = prepare_vectors_device(cfg, x)
    z = np.load(CKPT)
    fields = {f: jnp.asarray(z[f]) for f in _CKPT_FIELDS}
    mask = (np.arange(N) < pos)[:, None]
    fields["vectors"] = jnp.where(jnp.asarray(mask), xp, 0)
    state = GraphState(**fields)
    print(f"resumed at {pos}/{N}", flush=True)

    # profile re-inserting rows [pos-K*B, pos) as if fresh (same shapes /
    # distribution as real tail-of-build inserts; ids overwrite in place)
    start = pos - n_batches * BATCH
    # warm up: the FIRST execution of each jitted program in a process
    # costs minutes on the remote relay (program load), independent of
    # compile caching — never time it (measured: batch 0 = 309s, batch
    # 1+ = 1.78s at 1M x 768, batch 1024)
    wids = np.arange(start, start + BATCH, dtype=np.int32)
    wlv = sample_levels(
        jnp.asarray(wids), cfg.rng_seed, cfg.level_factor, cfg.lu
    )
    state = insert_batch(cfg, state, jnp.asarray(wids), xp[start:start + BATCH], wlv)
    state.count.block_until_ready()
    print("warmup batch done", flush=True)
    if TIMING:
        timing.enable()
    t0 = time.time()
    for bi in range(n_batches):
        ids = np.arange(start + bi * BATCH, start + (bi + 1) * BATCH,
                        dtype=np.int32)
        bi_dev = jnp.asarray(ids)
        bv = xp[start + bi * BATCH : start + (bi + 1) * BATCH]
        lv = sample_levels(
            jnp.maximum(bi_dev, 0), cfg.rng_seed, cfg.level_factor, cfg.lu
        )
        tb = time.time()
        state = insert_batch(cfg, state, bi_dev, bv, lv)
        state.count.block_until_ready()
        print(f"  batch {bi}: {time.time() - tb:.3f}s", flush=True)
    wall = time.time() - t0
    print(f"{n_batches} batches of {BATCH}: "
          f"{n_batches * BATCH / wall:.0f} vec/s", flush=True)
    timing.print_stats()


if __name__ == "__main__":
    main()
