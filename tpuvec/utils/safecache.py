"""Atomic writes for jax's persistent compilation cache.

jax's LRUCache.put writes entries with a bare ``Path.write_bytes``
(jax/_src/lru_cache.py) — NOT atomic. A process killed mid-write (driver
timeout, Ctrl-C, crash) leaves a truncated zstd entry, and every later
process that reads that key SEGFAULTS inside executable deserialization
(observed twice on this box: fatal crash in
``compilation_cache.get_executable_and_time``). This module monkeypatches
``put`` to write to a same-directory temp file and ``os.replace`` it into
place, which makes interrupted writers harmless.

Call ``enable_atomic_cache_writes()`` before the first jit compilation in
any process that sets ``jax_compilation_cache_dir``.
"""

from __future__ import annotations

import os
import tempfile

_patched = False


def enable_atomic_cache_writes() -> None:
    global _patched
    if _patched:
        return
    try:
        from jax._src import lru_cache
    except ImportError:  # cache layout changed; fail open
        return

    orig_put = lru_cache.LRUCache.put

    def atomic_put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        cache_path = self.path / f"{key}{lru_cache._CACHE_SUFFIX}"
        if cache_path.exists():
            return
        fd, tmp = tempfile.mkstemp(
            dir=str(self.path), prefix=".tmp-", suffix=".part"
        )
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(val)
            os.replace(tmp, cache_path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        if self.eviction_enabled:
            # keep the original bookkeeping (atime sidecar + eviction)
            try:
                self._evict_if_needed(additional_size=0)
                import time as _time

                atime_path = self.path / f"{key}{lru_cache._ATIME_SUFFIX}"
                atime_path.write_bytes(_time.time_ns().to_bytes(8, "little"))
            except OSError:
                pass

    # only replace when the upstream signature still matches
    if orig_put.__name__ == "put":
        lru_cache.LRUCache.put = atomic_put
        _patched = True
