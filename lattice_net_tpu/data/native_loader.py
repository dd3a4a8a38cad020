"""ctypes bridge to the native threaded cloud loader (native/cloud_loader.cpp).

Gives the host pipeline the same shape as the reference's external C++
``dataloaders`` library: reader threads decode scans into a bounded ring
buffer while the TPU computes; python drains zero-copy numpy views.  Builds
on demand with ``make -C native`` (g++ only); falls back gracefully when the
shared library is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libcloud_loader.so"

FORMAT_KITTI_BIN = 0
FORMAT_SHAPENET_PTS = 1


def build_native(force: bool = False) -> bool:
    """Compile the shared library if needed; returns availability."""
    if _SO.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
        return _SO.exists()
    except Exception:
        return False


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not build_native():
        raise OSError("native cloud loader unavailable (build failed)")
    lib = ctypes.CDLL(str(_SO))
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint, ctypes.c_int,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_free_sample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_queue_depth.restype = ctypes.c_int
    lib.loader_queue_depth.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


class NativeCloudLoader:
    """Iterator over (xyz, extra, labels) numpy arrays, decoded off-thread."""

    def __init__(
        self,
        files,
        label_files=None,
        fmt: int = FORMAT_KITTI_BIN,
        n_threads: int = 4,
        queue_capacity: int = 8,
        shuffle: bool = False,
        seed: int = 0,
        loop: bool = False,
    ):
        lib = _load()
        self._lib = lib
        files = [str(f) for f in files]
        self.nr_files = len(files)
        c_files = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        if label_files is not None:
            lf = [str(x) if x else "" for x in label_files]
            c_labels = (ctypes.c_char_p * len(files))(*[x.encode() for x in lf])
        else:
            c_labels = None
        self._h = lib.loader_create(
            c_files, c_labels, len(files), fmt, n_threads, queue_capacity,
            int(shuffle), seed, int(loop),
        )
        if not self._h:
            raise OSError("loader_create failed")

    def queue_depth(self) -> int:
        return self._lib.loader_queue_depth(self._h)

    def next(self):
        """Blocking pop; returns (xyz (N,3) f32, extra (N,) f32, labels (N,) i32)
        or None at end of data."""
        xyz = ctypes.POINTER(ctypes.c_float)()
        extra = ctypes.POINTER(ctypes.c_float)()
        labels = ctypes.POINTER(ctypes.c_int)()
        n = ctypes.c_int()
        ok = self._lib.loader_next(
            self._h, ctypes.byref(xyz), ctypes.byref(extra), ctypes.byref(labels), ctypes.byref(n)
        )
        if not ok:
            return None
        count = n.value
        # copy into numpy (owned) then free the C buffers
        xyz_np = np.ctypeslib.as_array(xyz, shape=(count, 3)).copy()
        extra_np = np.ctypeslib.as_array(extra, shape=(count,)).copy()
        labels_np = np.ctypeslib.as_array(labels, shape=(count,)).copy()
        self._lib.loader_free_sample(xyz, extra, labels)
        return xyz_np, extra_np, labels_np

    def __iter__(self):
        while True:
            s = self.next()
            if s is None:
                return
            yield s

    def close(self):
        if getattr(self, "_h", None):
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
