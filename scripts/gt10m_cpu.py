"""Host-side ground-truth partials for the 10M binary config (config 4).

Computes, per 250K corpus chunk, the exact cosine top-K of the QN probe
queries against that chunk (float64-free single-core numpy; ~2-3 min per
chunk) and saves them to /tmp/x10m_gt_parts/{start}.npz. phase_search
(scripts/probe_10m_binary.py) merges the partials for any chunk-aligned
built prefix instead of burning TPU time on the streamed GT pass.

Run alongside a TPU build or outage — touches no device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# force CPU BEFORE importing anything that touches jnp at module scope:
# backend init on the axon platform blocks in a connect-retry sleep loop
# whenever the relay is down — exactly when this script is most useful
import jax

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("TPUVEC_BIN_N", "10000000")

K = 10


def main():
    import probe_10m_binary as p

    out = f"/tmp/x10m_gt_parts_n{p.N}"
    os.makedirs(out, exist_ok=True)
    q = np.asarray(p.queries()[: p.QN], dtype=np.float32)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    for start in range(0, p.N, p.GEN_CHUNK):
        path = f"{out}/{start:09d}.npz"
        if os.path.exists(path):
            continue
        x = p.gen_chunk(start, min(p.GEN_CHUNK, p.N - start))
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        sims = qn @ xn.T  # [QN, chunk]
        idx = np.argpartition(-sims, K, axis=1)[:, :K]
        d = 1.0 - np.take_along_axis(sims, idx, axis=1)
        order = np.argsort(d, axis=1, kind="stable")
        d = np.take_along_axis(d, order, axis=1)
        ids = np.take_along_axis(idx, order, axis=1) + start
        np.savez(path + f".tmp{os.getpid()}.npz", gt_d=d, gt_i=ids)
        os.replace(path + f".tmp{os.getpid()}.npz", path)
        print(f"gt chunk {start} done", flush=True)


if __name__ == "__main__":
    main()
