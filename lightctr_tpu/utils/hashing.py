"""Feature hashing — capability parity with the reference's MurmurHash2
(common/hash.h:16-58, which keys its consistent-hash DHT). Used here for
hashing string/large-id features into a bounded vocabulary and for
deterministic shard assignment diagnostics (the actual table routing is
contiguous row sharding under GSPMD; see parallel/sharding.py).
"""

from __future__ import annotations

import numpy as np


_M = np.uint64(0xC6A4A7935BD1E995)
_R = 47


def murmur64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorised MurmurHash64A over uint64 keys."""
    with np.errstate(over="ignore"):
        k = np.asarray(keys, np.uint64)
        h = np.uint64(seed) ^ (np.uint64(8) * _M)
        k = k * _M
        k ^= k >> np.uint64(_R)
        k = k * _M
        h = (np.broadcast_to(h, k.shape) ^ k) * _M
        h ^= h >> np.uint64(_R)
        h = h * _M
        h ^= h >> np.uint64(_R)
        return h


def murmur_string(s: str, seed: int = 0) -> int:
    """String hash via chunked murmur64 mixing (for vocab-less feature
    pipelines: `field:token` -> id)."""
    data = s.encode()
    pad = (-len(data)) % 8
    arr = np.frombuffer(data + b"\0" * pad, np.uint64)
    h = np.uint64(seed)
    with np.errstate(over="ignore"):
        for chunk in arr:
            h = murmur64(np.asarray([chunk ^ h]))[0]
    return int(h)


def hash_to_vocab(keys: np.ndarray, vocab_size: int, seed: int = 0) -> np.ndarray:
    """Feature hashing trick: arbitrary int keys -> [0, vocab_size)."""
    return (murmur64(keys, seed) % np.uint64(vocab_size)).astype(np.int64)
