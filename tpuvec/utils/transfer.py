"""Chunked host<->device transfers.

The axon relay stalls on multi-GB single transfers (a 3 GB jnp.asarray
wedged indefinitely; ~300 MB is fine). Slice big arrays into bounded
chunks and concatenate on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_device_chunked", "prepare_vectors_chunked", "prepare_vectors_device"]

_DEFAULT_CHUNK_BYTES = 128 * 1024 * 1024


def to_device_chunked(x: np.ndarray, chunk_bytes: int = _DEFAULT_CHUNK_BYTES):
    """device_put a large [N, ...] array in row chunks."""
    row_bytes = max(x.nbytes // max(x.shape[0], 1), 1)
    rows = max(chunk_bytes // row_bytes, 1)
    if x.shape[0] <= rows:
        return jnp.asarray(x)
    parts = [jnp.asarray(x[i : i + rows]) for i in range(0, x.shape[0], rows)]
    return jnp.concatenate(parts, axis=0)


def prepare_vectors_chunked(config, x: np.ndarray, chunk_rows: int = 65536):
    """prepare_vectors over row chunks; returns a host numpy array."""
    from tpuvec.index.graph import prepare_vectors

    outs = []
    for i in range(0, x.shape[0], chunk_rows):
        outs.append(np.asarray(prepare_vectors(config, jnp.asarray(x[i : i + chunk_rows]))))
    return np.concatenate(outs, axis=0)


def prepare_vectors_device(config, x: np.ndarray, chunk_rows: int = 32768):
    """Chunked upload + on-device prepare; result STAYS on device.

    For million-scale builds: avoids pulling the prepared corpus back to
    host (and re-uploading it batch by batch) — ~2x corpus size of relay
    traffic saved.
    """
    from tpuvec.index.graph import prepare_vectors

    parts = []
    for i in range(0, x.shape[0], chunk_rows):
        parts.append(prepare_vectors(config, jnp.asarray(x[i : i + chunk_rows])))
    out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    return out
