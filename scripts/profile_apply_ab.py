"""A/B the level-0 reverse-scatter program at 1M (round-4 build hunt).

Two sessions measured the aliased scatter serializing to ~258-277 ms
inside the donated chain, while shape-identical standalone microbenches
run at 0.1 ms — stage timers on this relay mis-attribute, so this
script measures the only number that can't lie: end-to-end marginal
insert rate over a few batches, per _apply_rows variant, in ONE
process (insert_batch picks up the monkeypatched symbol at call time).

Variants: committed (donated+barrier) / dense (scatter-free
searchsorted rewrite, TPUVEC_REV_APPLY=dense's program) / nodonate
(XLA copies the adjacency, scatter stays dense) / unique (donated,
unique_indices).

Usage: python scripts/profile_apply_ab.py [n_batches_per_variant]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# _apply_rows_impl() consults TPUVEC_REV_APPLY before the monkeypatched
# B._apply_rows: with dense the default since round 5, only =scatter
# routes through the B._apply_rows attribute this script swaps per
# variant. Anything else would silently run the dense program for EVERY
# variant and the A/B would measure nothing.
os.environ["TPUVEC_REV_APPLY"] = "scatter"

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import tpuvec.index.build as B
from tpuvec.index import HnswParams
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

_committed_apply = B._apply_rows


@partial(jax.jit, static_argnames=("protect",))
def _apply_nodonate(adj, adj_dist, tgt, new_rows, new_rowsd, protect: int):
    adj = adj.at[tgt, protect:].set(new_rows, mode="drop")
    adj_dist = adj_dist.at[tgt, protect:].set(new_rowsd, mode="drop")
    return adj, adj_dist


@partial(jax.jit, static_argnames=("protect",), donate_argnames=("adj", "adj_dist"))
def _apply_unique(adj, adj_dist, tgt, new_rows, new_rowsd, protect: int):
    adj = adj.at[tgt, protect:].set(
        new_rows, mode="drop", unique_indices=True
    )
    adj_dist = adj_dist.at[tgt, protect:].set(
        new_rowsd, mode="drop", unique_indices=True
    )
    return adj, adj_dist


def main():
    per = int(sys.argv[1]) if len(sys.argv) > 1 else 6
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

    variants = [
        ("committed", _committed_apply),
        ("dense", B._apply_rows_dense),
        ("nodonate", _apply_nodonate),
        ("unique", _apply_unique),
        ("committed2", _committed_apply),
    ]
    start = pos - (len(variants) * (per + 1) + 1) * BATCH
    bi = 0

    def one_batch(state):
        nonlocal bi
        s0 = start + bi * BATCH
        bi += 1
        ids = jnp.asarray(np.arange(s0, s0 + BATCH, dtype=np.int32))
        lv = sample_levels(ids, cfg.rng_seed, cfg.level_factor, cfg.lu)
        t0 = time.time()
        state = B.insert_batch(cfg, state, ids, xp[s0:s0 + BATCH], lv)
        state.count.block_until_ready()
        return state, time.time() - t0

    for name, fn in variants:
        B._apply_rows = fn
        state, wdt = one_batch(state)  # per-variant program-load warmup
        ts = []
        for _ in range(per):
            state, dt = one_batch(state)
            ts.append(dt)
        rate = BATCH / (sum(ts) / len(ts))
        print(
            f"{name:10s}: warm {wdt:6.1f}s, then "
            + " ".join(f"{t:5.2f}" for t in ts)
            + f" s/batch -> {rate:5.0f} vec/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
