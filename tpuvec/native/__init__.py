"""Native (C++) runtime bindings, loaded via ctypes.

The reference's native substrate is bundled SQLite C + simsimd
(SURVEY.md L0). tpuvec's native runtime currently provides the snapshot
storage engine (csrc/tvstore.cpp): single-file columnar snapshots written
atomically and read back zero-copy via mmap with CRC32 integrity.

The library auto-builds with g++ on first use (``make -C csrc``); every
caller must handle ``available() == False`` and fall back to the pure
Python path (np.savez in store.snapshot).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "TvsWriter", "TvsReader", "NATIVE_DIR"]

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(NATIVE_DIR, "libtvstore.so")
_CSRC = os.path.join(os.path.dirname(os.path.dirname(NATIVE_DIR)), "csrc")

_lock = threading.Lock()
_lib = None
_tried = False

# dtype codes shared with the C++ side (opaque tags; numpy mapping here)
_DTYPES = [
    np.dtype("float32"),
    np.dtype("float64"),
    np.dtype("int8"),
    np.dtype("int16"),
    np.dtype("int32"),
    np.dtype("int64"),
    np.dtype("uint8"),
    np.dtype("uint16"),
    np.dtype("uint32"),
    np.dtype("uint64"),
    np.dtype("bool"),
]
_DTYPE_CODE = {dt: i for i, dt in enumerate(_DTYPES)}


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tvs_last_error.restype = ctypes.c_char_p
        lib.tvs_writer_open.restype = ctypes.c_void_p
        lib.tvs_writer_open.argtypes = [ctypes.c_char_p]
        lib.tvs_writer_add.restype = ctypes.c_int
        lib.tvs_writer_add.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint8,
            ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_void_p,
            ctypes.c_uint64,
        ]
        lib.tvs_writer_finish.restype = ctypes.c_int
        lib.tvs_writer_finish.argtypes = [ctypes.c_void_p]
        lib.tvs_writer_abort.argtypes = [ctypes.c_void_p]
        lib.tvs_reader_open.restype = ctypes.c_void_p
        lib.tvs_reader_open.argtypes = [ctypes.c_char_p]
        lib.tvs_reader_count.restype = ctypes.c_uint64
        lib.tvs_reader_count.argtypes = [ctypes.c_void_p]
        lib.tvs_reader_info.restype = ctypes.c_int
        lib.tvs_reader_info.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.tvs_reader_data.restype = ctypes.c_void_p
        lib.tvs_reader_data.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.tvs_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class TvsWriter:
    """Write named numpy arrays to a tvstore snapshot (atomic on finish)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tvstore library unavailable")
        self._lib = lib
        self._h = lib.tvs_writer_open(path.encode())
        if not self._h:
            raise OSError(lib.tvs_last_error().decode())

    def add(self, name: str, arr: np.ndarray) -> None:
        orig_shape = np.asarray(arr).shape  # ascontiguousarray promotes 0-d to 1-d
        arr = np.ascontiguousarray(arr)
        code = _DTYPE_CODE.get(arr.dtype)
        if code is None:
            raise TypeError(f"unsupported dtype {arr.dtype}")
        shape = (ctypes.c_uint64 * max(len(orig_shape), 1))(*(orig_shape or (0,)))
        rc = self._lib.tvs_writer_add(
            self._h,
            name.encode(),
            code,
            len(orig_shape),
            shape,
            arr.ctypes.data_as(ctypes.c_void_p),
            arr.nbytes,
        )
        if rc != 0:
            raise OSError(self._lib.tvs_last_error().decode())

    def finish(self) -> None:
        rc = self._lib.tvs_writer_finish(self._h)
        self._h = None
        if rc != 0:
            raise OSError(self._lib.tvs_last_error().decode())

    def abort(self) -> None:
        if self._h:
            self._lib.tvs_writer_abort(self._h)
            self._h = None


class TvsReader:
    """Read a tvstore snapshot; arrays come back as copies of the mmap."""

    def __init__(self, path: str, verify: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tvstore library unavailable")
        self._lib = lib
        self._verify = 1 if verify else 0
        self._h = lib.tvs_reader_open(path.encode())
        if not self._h:
            raise OSError(lib.tvs_last_error().decode())

    def keys(self) -> list[str]:
        out = []
        n = self._lib.tvs_reader_count(self._h)
        for i in range(n):
            name, *_ = self._info(i)
            out.append(name)
        return out

    def _info(self, i: int):
        name_buf = ctypes.create_string_buffer(512)
        dtype = ctypes.c_uint8()
        ndim = ctypes.c_uint8()
        shape = (ctypes.c_uint64 * 8)()
        blen = ctypes.c_uint64()
        rc = self._lib.tvs_reader_info(
            self._h, i, name_buf, 512, ctypes.byref(dtype),
            ctypes.byref(ndim), shape, ctypes.byref(blen),
        )
        if rc != 0:
            raise OSError(self._lib.tvs_last_error().decode())
        return (
            name_buf.value.decode(),
            _DTYPES[dtype.value],
            tuple(shape[j] for j in range(ndim.value)),
            blen.value,
        )

    def read_all(self) -> dict[str, np.ndarray]:
        out = {}
        n = self._lib.tvs_reader_count(self._h)
        for i in range(n):
            name, dt, shape, blen = self._info(i)
            ptr = self._lib.tvs_reader_data(self._h, i, self._verify)
            if not ptr:
                raise OSError(self._lib.tvs_last_error().decode())
            buf = ctypes.cast(
                ptr, ctypes.POINTER(ctypes.c_uint8 * blen)
            ).contents
            arr = np.frombuffer(bytes(buf), dtype=dt)
            out[name] = arr.reshape(shape)  # () reshapes to a 0-d scalar
        return out

    def close(self) -> None:
        if self._h:
            self._lib.tvs_reader_close(self._h)
            self._h = None
