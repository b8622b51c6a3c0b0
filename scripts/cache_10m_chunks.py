"""Host-only helper: pre-generate the 10M corpus chunks to /tmp.

Runs ALONGSIDE the 10M build (touches no TPU): the GT/shadow phase of
probe_10m_binary reads these instead of regenerating 40 GB on the single
host core (~65 s/chunk gen vs ~3 s/chunk read).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpuvec.utils.data import synthetic_embeddings

N, D, GEN_CHUNK = 10_000_000, 1024, 250_000
OUT = "/tmp/x10m_chunks_v2"


def main():
    os.makedirs(OUT, exist_ok=True)
    for start in range(0, N, GEN_CHUNK):
        path = f"{OUT}/{start:09d}.npy"
        if os.path.exists(path):
            continue
        x = synthetic_embeddings(
            GEN_CHUNK, D, n_clusters=1024,
            seed=10_000 + start // GEN_CHUNK, structure_seed=77,
        )
        np.save(path + ".tmp.npy", x)
        os.replace(path + ".tmp.npy", path)
        print(f"cached {start}", flush=True)


if __name__ == "__main__":
    main()
