"""ctypes bindings for the native C++ data pipeline (native/batcher.cc).

``NativeDataSet`` is a drop-in replacement for ``training.data.DataSet`` with
index-gather batching (no full-array reshuffles) and a ``next_block`` that
stages K minibatches for the scanned training loop in one native call. Builds
the shared library on first use if g++ is available; callers can fall back to
the numpy DataSet when ``available()`` is False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libzigp_native.so")

_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    # Always invoke make: it is mtime-keyed, so this is a no-op when the .so
    # is current and a rebuild when batcher.cc changed (a stale library must
    # never silently shadow edited source). Tolerate a failed make if a
    # loadable library already exists (e.g. no compiler on the machine).
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        if not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    c_dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.zigp_batcher_create.restype = ctypes.c_void_p
    lib.zigp_batcher_create.argtypes = [
        c_dbl_p, c_dbl_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
    ]
    lib.zigp_batcher_next.restype = None
    lib.zigp_batcher_next.argtypes = [ctypes.c_void_p, ctypes.c_int64, c_dbl_p, c_dbl_p]
    lib.zigp_batcher_next_block.restype = None
    lib.zigp_batcher_next_block.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, c_dbl_p, c_dbl_p,
    ]
    lib.zigp_batcher_skip.restype = None
    lib.zigp_batcher_skip.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.zigp_batcher_epochs.restype = ctypes.c_int64
    lib.zigp_batcher_epochs.argtypes = [ctypes.c_void_p]
    lib.zigp_batcher_destroy.restype = None
    lib.zigp_batcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeDataSet:
    """Epoch-shuffled minibatcher backed by the C++ batcher."""

    def __init__(self, x: np.ndarray, y: np.ndarray, *, seed: int = 121):
        lib = _load()
        if lib is None:
            raise RuntimeError("native batcher unavailable (build failed or no g++)")
        self._lib = lib
        # own contiguous float64 copies for the lifetime of the handle
        self._x = np.ascontiguousarray(x, dtype=np.float64)
        self._y = np.ascontiguousarray(y.reshape(x.shape[0], -1), dtype=np.float64)
        self._n, self._dx = self._x.shape
        self._dy = self._y.shape[1]
        self._h = lib.zigp_batcher_create(
            _as_c(self._x), _as_c(self._y), self._n, self._dx, self._dy, seed
        )

    @property
    def num_examples(self) -> int:
        return self._n

    @property
    def arrays(self):
        """(X, Y) backing arrays — for device-resident sampling."""
        return self._x, self._y

    @property
    def epochs_completed(self) -> int:
        return int(self._lib.zigp_batcher_epochs(self._h))

    def next_batch(self, batch_size: int, shuffle: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        bx = np.empty((batch_size, self._dx), dtype=np.float64)
        by = np.empty((batch_size, self._dy), dtype=np.float64)
        self._lib.zigp_batcher_next(self._h, batch_size, _as_c(bx), _as_c(by))
        return bx, by

    def next_block(self, batch_size: int, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Stage k minibatches: returns ((k, B, dx), (k, B, dy))."""
        bx = np.empty((k, batch_size, self._dx), dtype=np.float64)
        by = np.empty((k, batch_size, self._dy), dtype=np.float64)
        self._lib.zigp_batcher_next_block(self._h, batch_size, k, _as_c(bx), _as_c(by))
        return bx, by

    def skip(self, batch_size: int, k: int):
        """Fast-forward past k batches without copying rows (resume support)."""
        self._lib.zigp_batcher_skip(self._h, batch_size, k)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.zigp_batcher_destroy(self._h)
                self._h = None
        except Exception:
            pass


def make_dataset(x: np.ndarray, y: np.ndarray, *, seed: int = 121, prefer_native: bool = True):
    """NativeDataSet when the library is available, numpy DataSet otherwise."""
    if prefer_native and available():
        return NativeDataSet(x, y, seed=seed)
    from ..training.data import DataSet

    return DataSet(x, y, seed=seed)
