"""Time _stage_write standalone at 1M (round-4 candidates-gap hunt).

profile_insert_1m syncs every stage EXCEPT write (its timer measures
dispatch only), so write's device time lands in the candidates timer.
Standalone beam+descent cost 322 ms but in-insert candidates measured
591 ms — if the ~270 ms gap is _stage_write, its donated scatters are
serializing exactly like the level-0 reverse scatter did (_apply_rows
docstring; donation forces an in-place per-row update loop).

Usage: python scripts/profile_write.py [reps]
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
from tpuvec.index.build import _stage_write
from tpuvec.index.graph import GraphState, config_for
from tpuvec.types import DistanceMetric
from tpuvec.utils.prng import sample_levels
from tpuvec.utils.safecache import enable_atomic_cache_writes
from tpuvec.utils.transfer import prepare_vectors_device

enable_atomic_cache_writes()

N, D, BATCH = 1_000_000, 768, 1024
CKPT = f"/tmp/tpuvec_bench_{N}x{D}.npz"
_CKPT_FIELDS = [
    "adj0", "adj0_dist", "levels", "upper_slot", "upper_nodes",
    "upper_adj", "upper_dist", "entry_point", "entry_level", "count",
    "upper_count",
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    params = HnswParams(m=16, max_m0=32, ef_construction=200, ef_search=128)
    cfg = config_for(D, metric=DistanceMetric.COSINE, params=params, cap=N)
    with open(CKPT + ".json") as f:
        pos = int(json.load(f)["pos"])
    cache = f"/tmp/tpuvec_data_{N + 256 * 6}x{D}_c1024_s0.npy"
    x = np.load(cache, mmap_mode="r")[:N]
    xp = prepare_vectors_device(cfg, x)
    z = np.load(CKPT)
    fields = {f: jnp.asarray(z[f]) for f in _CKPT_FIELDS}
    mask = (np.arange(N) < pos)[:, None]
    fields["vectors"] = jnp.where(jnp.asarray(mask), xp, 0)
    state = GraphState(**fields)
    print(f"resumed at {pos}/{N}", flush=True)

    # distinct ids/vecs per rep; ids overwrite the tail in place so the
    # state stays valid when donated through repeatedly
    t_total = 0.0
    for i in range(reps + 1):
        ids = np.arange(pos - (i + 1) * BATCH, pos - i * BATCH, dtype=np.int32)
        vecs = xp[pos - (i + 1) * BATCH : pos - i * BATCH]
        idj = jnp.asarray(ids)
        lv = sample_levels(
            jnp.maximum(idj, 0), cfg.rng_seed, cfg.level_factor, cfg.lu
        )
        jax.block_until_ready(state.count)
        t0 = time.time()
        state = _stage_write(cfg, state, idj, vecs, lv)
        jax.block_until_ready(state.count)
        dt = time.time() - t0
        tag = "warmup" if i == 0 else f"rep {i}"
        print(f"  {tag}: {dt * 1e3:8.1f} ms", flush=True)
        if i > 0:
            t_total += dt
    print(f"_stage_write: {t_total / reps * 1e3:.1f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
