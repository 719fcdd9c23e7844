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


_MAX_LEB_BYTES = 10  # ceil(64 / 7)
_SHIFTS = np.arange(_MAX_LEB_BYTES, dtype=np.uint64) * np.uint64(7)


def varuint_encode(values: np.ndarray) -> bytes:
    """LEB128 encode an array of non-negative ints.

    Vectorised: emits every value's candidate bytes as an [N, 10] matrix
    (byte j = bits [7j, 7j+7)), sets continuation bits on all but each
    value's last byte, then compacts with a boolean mask — no per-element
    Python loop (the reference's appendVarUint, buffer.h:113, is a
    per-value while loop; at table scale that costs ~100x).
    """
    values = np.asarray(values, np.uint64).ravel()
    if values.size == 0:
        return b""
    out = np.empty((values.size, _MAX_LEB_BYTES), np.uint8)
    nbytes = np.ones(values.size, np.int64)
    for jj in range(_MAX_LEB_BYTES):
        out[:, jj] = (values >> np.uint64(7 * jj)).astype(np.uint8) & 0x7F
        if jj:
            nbytes += values >= np.uint64(1 << (7 * jj))
    j = np.arange(_MAX_LEB_BYTES)
    keep = j[None, :] < nbytes[:, None]
    cont = j[None, :] < (nbytes - 1)[:, None]
    out[cont] |= 0x80
    return out[keep].tobytes()


def varuint_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Vectorised LEB128 decode: terminal bytes (high bit clear) mark value
    boundaries; per-group positional shifts + np.add.reduceat reassemble."""
    b = np.frombuffer(data, np.uint8)
    if b.size == 0:
        return np.empty((0,), np.uint64)
    terminal = (b & 0x80) == 0
    if count is not None:
        # stop after `count` values (trailing payload may follow the keys)
        ends = np.flatnonzero(terminal)
        if len(ends) > count:
            b = b[: ends[count - 1] + 1]
            terminal = terminal[: b.size]
    starts = np.empty(b.size, np.bool_)
    starts[0] = True
    starts[1:] = terminal[:-1]
    start_idx = np.flatnonzero(starts)
    pos = np.arange(b.size) - np.repeat(
        start_idx, np.diff(np.append(start_idx, b.size))
    )
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    return np.add.reduceat(contrib, start_idx)


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


def decode_sparse_update(data: bytes, dim: int = 1):
    """Inverse of encode_sparse_update. dim > 1 reads a [count, dim]
    value block per key (the reference's 'T' dense-tensor payloads,
    paramserver.h:146-160, share the wire with scalar 'N' entries)."""
    count = int(np.frombuffer(data[:4], np.uint32)[0])
    keylen = int(np.frombuffer(data[4:8], np.uint32)[0])
    ids = delta_varuint_decode(data[8 : 8 + keylen], count)
    values = fp16_decode(data[8 + keylen :])
    if dim > 1:
        return ids, values[: count * dim].reshape(count, dim)
    return ids, values[:count] if values.ndim == 1 else values
