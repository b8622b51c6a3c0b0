"""Host-side packed sign bits for the 10M binary config (config 4).

phase_prepare (scripts/probe_10m_binary.py) packs mean-threshold sign
bits by streaming all 40 GB of f32 chunks through the relay-attached TPU.
The bits are scale-invariant (x >= mean(x) is unchanged by the cosine
normalization prepare_vectors applies first), so this computes the same
packed words with numpy and writes the exact VEC_NPY file phase_prepare
looks for — zero relay traffic, ~1 min/chunk on the single host core.

Word layout must match tpuvec.quantize.pack_bits_to_words: uint32 words,
LSB-first (word w bit b = element 32*w + b) — np.packbits(bitorder=
"little") + a little-endian uint32 view. Run alongside a TPU build or
outage — touches no device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("TPUVEC_BIN_N", "10000000")


def main():
    import probe_10m_binary as p

    cfg = p.get_cfg()
    if os.path.exists(p.VEC_NPY):
        print("already present")
        return
    words = p.D // 32
    out = np.lib.format.open_memmap(
        p.VEC_NPY + ".tmp.npy", mode="w+", dtype=np.uint32,
        shape=(p.N, cfg.padded_dim),
    )
    for start in range(0, p.N, p.GEN_CHUNK):
        x = p.gen_chunk(start, min(p.GEN_CHUNK, p.N - start))
        bits = x >= x.mean(axis=-1, keepdims=True)
        packed = np.packbits(bits, axis=-1, bitorder="little")
        w = packed.view("<u4").astype(np.uint32)
        if cfg.padded_dim > words:
            w = np.pad(w, ((0, 0), (0, cfg.padded_dim - words)))
        out[start : start + w.shape[0]] = w
        print(f"pack chunk {start} done", flush=True)
    out.flush()
    del out
    os.replace(p.VEC_NPY + ".tmp.npy", p.VEC_NPY)


if __name__ == "__main__":
    main()
