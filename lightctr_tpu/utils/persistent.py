"""mmap-backed persistent arrays — capability parity with the reference's
PersistentBuffer (common/persistent_buffer.h:26-90, mmap'd file buffer)
and the SysV-shm ShmHashTable (util/shm_hashtable.h: cross-process param
KV). On the TPU build these serve host-side roles: memory-mapped feature
stores / embedding caches shared by data-loader worker processes, and
crash-surviving scratch state.
"""

from __future__ import annotations

import json
import os

import numpy as np


class PersistentArray:
    """A named, mmap-backed numpy array that survives process restarts."""

    def __init__(self, path: str, shape=None, dtype=np.float32, mode: str = "r+"):
        meta_path = path + ".meta.json"
        if os.path.exists(path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.array = np.memmap(
                path, dtype=np.dtype(meta["dtype"]), mode=mode,
                shape=tuple(meta["shape"]),
            )
        else:
            if shape is None:
                raise FileNotFoundError(f"{path} does not exist and no shape given")
            self.array = np.memmap(path, dtype=dtype, mode="w+", shape=tuple(shape))
            with open(meta_path, "w") as f:
                json.dump({"shape": list(shape), "dtype": np.dtype(dtype).name}, f)
        self.path = path

    def flush(self):
        self.array.flush()

    def __getitem__(self, idx):
        return self.array[idx]

    def __setitem__(self, idx, value):
        self.array[idx] = value


class PersistentKV:
    """Fixed-capacity open-addressing int64->float32[dim] store on mmap —
    the ShmHashTable capability (insertOrUpdate semantics,
    shm_hashtable.h:91-151) with file-backed persistence instead of SysV
    shm. Single-writer; readers may map the same file read-only."""

    EMPTY = np.int64(-1)

    def __init__(self, path: str, capacity: int = 0, dim: int = 1):
        self.keys = PersistentArray(path + ".keys", (capacity,) if capacity else None,
                                    np.int64)
        if capacity and not np.any(self.keys.array):
            self.keys.array[:] = self.EMPTY
        cap = self.keys.array.shape[0]
        self.values = PersistentArray(path + ".values", (cap, dim), np.float32)
        self.capacity = cap

    def _probe(self, key: int) -> int:
        cap = self.capacity
        idx = hash(int(key)) % cap
        for _ in range(cap):
            k = int(self.keys.array[idx])
            if k == key or k == self.EMPTY:
                return idx
            idx = (idx + 1) % cap
        raise RuntimeError("PersistentKV full")

    def put(self, key: int, value) -> None:
        # key -1 is the EMPTY slot sentinel: a stored -1 row would look
        # like a free slot to every later probe and be silently evicted
        # (same guard as the native csrc/shm_kv.cpp)
        if int(key) == int(self.EMPTY):
            raise ValueError("key -1 is the reserved EMPTY slot sentinel")
        idx = self._probe(key)
        self.keys.array[idx] = key
        self.values.array[idx] = value

    def get(self, key: int, default=None):
        if int(key) == int(self.EMPTY):
            return default
        idx = self._probe(key)
        if int(self.keys.array[idx]) == key:
            return np.array(self.values.array[idx])
        return default

    def flush(self):
        self.keys.flush()
        self.values.flush()
