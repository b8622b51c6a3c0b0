"""Host-side int8 shadow for the 10M binary config (config 4).

phase_search reranks against a per-row-scaled symmetric int8 shadow of
the f32 originals. Building it on-device means streaming 40 GB of f32
through the relay; precomputing the int8 rows here shrinks that to
10 GB. Must match ops math: scale = max|x| per row, round-half-even.

Writes /tmp/x10m_shadow_int8.npy (memmap-friendly).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("TPUVEC_BIN_N", "10000000")

OUT = "/tmp/x10m_shadow_int8.npy"


def main():
    import probe_10m_binary as p

    if os.path.exists(OUT):
        print("already present")
        return
    out = np.lib.format.open_memmap(
        OUT + ".tmp.npy", mode="w+", dtype=np.int8, shape=(p.N, p.D)
    )
    for start in range(0, p.N, p.GEN_CHUNK):
        x = p.gen_chunk(start, min(p.GEN_CHUNK, p.N - start))
        scale = np.max(np.abs(x), axis=-1, keepdims=True)
        q = np.round(x / np.maximum(scale, 1e-30) * 127).astype(np.int8)
        out[start : start + q.shape[0]] = q
        print(f"shadow chunk {start} done", flush=True)
    out.flush()
    del out
    os.replace(OUT + ".tmp.npy", OUT)


if __name__ == "__main__":
    main()
