"""ctypes bindings for the native shared-memory parameter KV.

csrc/shm_kv.cpp — the TPU build's runtime analogue of the reference's
SysV shm hashtable (util/shm_hashtable.h: open addressing in shared
memory, CAS updates; "shared parameters KV store in physical nodes",
README.md:12). POSIX shm segments + per-slot seqlocks, so a trainer
process can publish fresh embedding/weight rows and serving processes
on the same host read them live — no file round trips. Same
build-on-first-use ctypes pattern as data/native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC, "liblightctr_native.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["sh", os.path.join(_CSRC, "build.sh")], check=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.shmkv_open.restype = ctypes.c_void_p
    lib.shmkv_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                               ctypes.c_uint64, ctypes.c_int]
    lib.shmkv_capacity.restype = ctypes.c_uint64
    lib.shmkv_capacity.argtypes = [ctypes.c_void_p]
    lib.shmkv_dim.restype = ctypes.c_uint64
    lib.shmkv_dim.argtypes = [ctypes.c_void_p]
    lib.shmkv_count.restype = ctypes.c_uint64
    lib.shmkv_count.argtypes = [ctypes.c_void_p]
    lib.shmkv_put.restype = ctypes.c_int
    lib.shmkv_put.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_void_p]
    lib.shmkv_get.restype = ctypes.c_int
    lib.shmkv_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_void_p]
    lib.shmkv_put_batch.restype = ctypes.c_int
    lib.shmkv_put_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_uint64]
    lib.shmkv_get_batch.restype = None
    lib.shmkv_get_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_uint64]
    lib.shmkv_close.restype = None
    lib.shmkv_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return lib


class ShmKV:
    """Fixed-capacity shared-memory KV of float32 rows keyed by int64.

    name: POSIX shm segment name (e.g. "/lightctr_model"). create=True
    initialises (or re-initialises) the segment; False attaches to an
    existing one (capacity/dim checked against its header).
    """

    def __init__(self, name: str, capacity: int = 0, dim: int = 0,
                 create: bool = False):
        self._lib = _load_lib()
        self._h = self._lib.shmkv_open(
            name.encode(), capacity, dim, 1 if create else 0)
        if not self._h:
            raise OSError(f"shmkv_open failed for {name!r} "
                          f"(create={create})")
        self.name = name
        self.capacity = int(self._lib.shmkv_capacity(self._h))
        self.dim = int(self._lib.shmkv_dim(self._h))

    def __len__(self):
        return int(self._lib.shmkv_count(self._h))

    def put(self, key: int, value) -> None:
        v = np.ascontiguousarray(value, np.float32)
        assert v.size == self.dim, (v.size, self.dim)
        rc = self._lib.shmkv_put(self._h, int(key),
                                 v.ctypes.data_as(ctypes.c_void_p))
        if rc == -2:
            raise ValueError("key -1 is the reserved EMPTY slot sentinel")
        if rc != 0:
            raise RuntimeError("shm KV full")

    def get(self, key: int, default=None):
        out = np.empty((self.dim,), np.float32)
        if self._lib.shmkv_get(self._h, int(key),
                               out.ctypes.data_as(ctypes.c_void_p)):
            return out
        return default

    def put_batch(self, keys, values) -> None:
        k = np.ascontiguousarray(keys, np.int64)
        v = np.ascontiguousarray(values, np.float32)
        assert v.shape == (len(k), self.dim), (v.shape, len(k), self.dim)
        rc = self._lib.shmkv_put_batch(
            self._h, k.ctypes.data_as(ctypes.c_void_p),
            v.ctypes.data_as(ctypes.c_void_p), len(k))
        if rc == -2:
            raise ValueError("key -1 is the reserved EMPTY slot sentinel")
        if rc != 0:
            raise RuntimeError("shm KV full")

    def get_batch(self, keys):
        """-> (values [n, dim] float32, found [n] bool); missing rows
        are zero."""
        k = np.ascontiguousarray(keys, np.int64)
        out = np.zeros((len(k), self.dim), np.float32)
        found = np.zeros((len(k),), np.uint8)
        self._lib.shmkv_get_batch(
            self._h, k.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            found.ctypes.data_as(ctypes.c_void_p), len(k))
        return out, found.astype(bool)

    def close(self, unlink: bool = False) -> None:
        if self._h:
            self._lib.shmkv_close(self._h, 1 if unlink else 0)
            self._h = None
