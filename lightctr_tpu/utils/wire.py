"""Host-side wire/storage codec — capability parity with the reference's
serialization buffer (common/buffer.h: LEB128-style VarUint codec
appendVarUint:113/readVarUint:152, fp16 values readHalfFloat:141 — the
format of all its PS traffic) and the Float16 scalar codec
(common/float16.h). Vectorised over numpy; used for compact host-side
artifacts (e.g. sparse model dumps, DCN-staged exchanges). On-device
compression lives in parallel/collectives.py and utils/compress.py.
"""

from __future__ import annotations

import numpy as np


def varuint_encode(values: np.ndarray) -> bytes:
    """LEB128 encode an array of non-negative ints."""
    values = np.asarray(values, np.uint64)
    out = bytearray()
    for v in values.tolist():
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def varuint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    out = []
    v = 0
    shift = 0
    for b in data:
        v |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            out.append(v)
            v = 0
            shift = 0
            if count is not None and len(out) >= count:
                break
    return np.asarray(out, np.uint64)


def delta_varuint_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta + VarUint for sorted id lists (the PS key-stream trick:
    ascending keys compress to ~1 byte each)."""
    ids = np.asarray(sorted_ids, np.uint64)
    if ids.size == 0:
        return b""
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return varuint_encode(deltas)


def delta_varuint_decode(data: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty((0,), np.uint64)
    return np.cumsum(varuint_decode(data, count)).astype(np.uint64)


def fp16_encode(values: np.ndarray) -> bytes:
    """IEEE754 binary16 with round-to-nearest-even (float16.h semantics —
    numpy's float16 cast implements exactly this incl. subnormals/NaN)."""
    return np.asarray(values, np.float32).astype(np.float16).tobytes()


def fp16_decode(data: bytes) -> np.ndarray:
    return np.frombuffer(data, np.float16).astype(np.float32)


def encode_sparse_update(ids: np.ndarray, values: np.ndarray) -> bytes:
    """The reference's PS push/pull payload shape: sorted VarUint keys +
    fp16 values (paramserver.h:159-176)."""
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    values = np.asarray(values)[order]
    head = np.uint32(len(ids)).tobytes()
    keys = delta_varuint_encode(ids)
    keylen = np.uint32(len(keys)).tobytes()
    return head + keylen + keys + fp16_encode(values)


def decode_sparse_update(data: bytes):
    count = int(np.frombuffer(data[:4], np.uint32)[0])
    keylen = int(np.frombuffer(data[4:8], np.uint32)[0])
    ids = delta_varuint_decode(data[8 : 8 + keylen], count)
    values = fp16_decode(data[8 + keylen :])
    return ids, values[:count] if values.ndim == 1 else values
