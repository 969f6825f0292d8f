"""Native host runtime bindings (ctypes over smc_runtime.cc).

Builds the shared library on first use (g++ -O2 -shared); everything
degrades gracefully to pure-Python fallbacks when no compiler is available,
so the sampler itself never depends on native code — only the off-critical-
path runtime (async checkpoint IO) and test oracles do.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "smc_runtime.cc")
_LIB_PATH = os.path.join(_HERE, "libsmc_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int64): 3,
    np.dtype(np.uint32): 4,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.ckpt_writer_open.restype = ctypes.c_void_p
        lib.ckpt_begin.restype = ctypes.c_void_p
        lib.ckpt_begin.argtypes = [ctypes.c_char_p]
        lib.ckpt_add_array.restype = ctypes.c_int
        lib.ckpt_add_array.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p]
        lib.ckpt_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ckpt_writer_flush.argtypes = [ctypes.c_void_p]
        lib.ckpt_writer_errors.argtypes = [ctypes.c_void_p]
        lib.ckpt_writer_errors.restype = ctypes.c_int64
        lib.ckpt_writer_written.argtypes = [ctypes.c_void_p]
        lib.ckpt_writer_written.restype = ctypes.c_int64
        lib.ckpt_writer_close.argtypes = [ctypes.c_void_p]
        lib.residual_systematic_cpp.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


# ---------------------------------------------------------------------------
# Async checkpoint writer
# ---------------------------------------------------------------------------
class AsyncCheckpointer:
    """Streams {name: array} snapshots to disk on a native background thread.

    The driver thread only pays for a memcpy; fsync-ordering is tmp+rename
    atomic per snapshot. Falls back to synchronous NumPy writes without the
    native library.
    """

    def __init__(self):
        self._lib = load_library()
        self._handle = (ctypes.c_void_p(self._lib.ckpt_writer_open())
                        if self._lib else None)
        self._closed = False

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def submit(self, path: str, arrays: dict) -> None:
        if self._closed:
            raise RuntimeError("checkpointer closed")
        if self._lib is None:
            save_snapshot_py(path, arrays)
            return
        b = ctypes.c_void_p(self._lib.ckpt_begin(path.encode()))
        for name, arr in arrays.items():
            # ascontiguousarray promotes 0-d to 1-d; restore the true shape
            a = np.ascontiguousarray(arr).reshape(np.shape(arr))
            code = _DTYPE_CODES.get(a.dtype)
            if code is None:
                a = a.astype(np.float32)
                code = 0
            shape = (ctypes.c_int64 * a.ndim)(*a.shape)
            rc = self._lib.ckpt_add_array(
                b, name.encode(), code, a.ndim, shape,
                a.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise ValueError(f"unsupported array for {name!r}")
        self._lib.ckpt_submit(self._handle, b)

    def flush(self) -> None:
        if self._handle is not None:
            self._lib.ckpt_writer_flush(self._handle)

    def stats(self):
        if self._handle is None:
            return {"written": None, "errors": None, "native": False}
        return {"written": int(self._lib.ckpt_writer_written(self._handle)),
                "errors": int(self._lib.ckpt_writer_errors(self._handle)),
                "native": True}

    def close(self) -> None:
        if self._handle is not None and not self._closed:
            self._lib.ckpt_writer_close(self._handle)
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# SMCK container readers/writers (Python side)
# ---------------------------------------------------------------------------
_MAGIC = 0x534D434B


def save_snapshot_py(path: str, arrays: dict) -> None:
    """Synchronous pure-Python writer of the same SMCK container."""
    import struct
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<II", _MAGIC, len(arrays)))
        for name, arr in arrays.items():
            a = np.ascontiguousarray(arr).reshape(np.shape(arr))
            code = _DTYPE_CODES.get(a.dtype)
            if code is None:
                a = a.astype(np.float32)
                code = 0
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<II", code, a.ndim))
            f.write(struct.pack(f"<{a.ndim}q", *a.shape))
            f.write(a.tobytes())
    os.replace(tmp, path)


def load_snapshot(path: str) -> dict:
    import struct
    out = {}
    with open(path, "rb") as f:
        magic, n_arrays = struct.unpack("<II", f.read(8))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an SMCK snapshot")
        for _ in range(n_arrays):
            (name_len,) = struct.unpack("<I", f.read(4))
            name = f.read(name_len).decode()
            code, ndim = struct.unpack("<II", f.read(8))
            shape = struct.unpack(f"<{ndim}q", f.read(8 * ndim)) if ndim \
                else ()
            dtype = _CODE_DTYPES[code]
            count = int(np.prod(shape)) if ndim else 1
            data = f.read(count * dtype.itemsize)
            out[name] = np.frombuffer(data, dtype=dtype).reshape(shape)
    return out


# ---------------------------------------------------------------------------
# Golden oracle: sequential residual-systematic resampling
# ---------------------------------------------------------------------------
def residual_systematic_oracle(weights: np.ndarray,
                               wrand_unit: float) -> np.ndarray:
    """Exact sequential Algorithm 2 (native if available, else Python)."""
    w = np.ascontiguousarray(np.asarray(weights, np.float64))
    n = w.shape[0]
    lib = load_library()
    if lib is not None:
        counts = np.zeros(n, np.int32)
        lib.residual_systematic_cpp(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            float(wrand_unit),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return counts
    inv_np = 1.0 / n
    counts = np.trunc(w * n).astype(np.int32)
    resid = w - counts * inv_np
    wrand = wrand_unit * inv_np
    s = 0.0
    for j in range(n):
        s += resid[j]
        if s >= wrand:
            counts[j] += 1
            wrand += inv_np
    return counts
