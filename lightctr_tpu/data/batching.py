"""Static-shape batching for TPU.

Every batch a jitted step sees must have the same shape, or XLA recompiles.
So: fixed batch size, fixed pad length, last partial batch padded with
zero-mask rows (and a row-validity mask so metrics/grads ignore them).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .libffm import SparseDataset


def pad_to_bucket(n: int, bucket: int) -> int:
    return ((n + bucket - 1) // bucket) * bucket


def sparse_batches(
    ds: SparseDataset,
    batch_size: int,
    rng: np.random.Generator | None = None,
    drop_remainder: bool = False,
) -> Iterator[dict]:
    """Yield dict batches with static shapes.

    Keys: ids/vals/fields/mask [B, L], labels [B], row_mask [B]
    (row_mask is 0 for padding rows in the final partial batch).
    """
    n = len(ds)
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        b = len(idx)
        if b < batch_size:
            if drop_remainder:
                return
            pad = np.zeros(batch_size - b, dtype=np.int64)
            idx = np.concatenate([idx, pad])
        sub = ds.take(idx)
        row_mask = np.zeros((batch_size,), dtype=np.float32)
        row_mask[:b] = 1.0
        yield {
            "ids": sub.ids,
            "vals": sub.vals,
            "fields": sub.fields,
            "mask": sub.mask * row_mask[:, None],
            "labels": sub.labels * row_mask,
            "row_mask": row_mask,
        }


def dense_batches(
    x: np.ndarray,
    y: np.ndarray,
    batch_size: int,
    rng: np.random.Generator | None = None,
    drop_remainder: bool = False,
) -> Iterator[dict]:
    n = x.shape[0]
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        b = len(idx)
        if b < batch_size:
            if drop_remainder:
                return
            idx = np.concatenate([idx, np.zeros(batch_size - b, dtype=np.int64)])
        row_mask = np.zeros((batch_size,), dtype=np.float32)
        row_mask[:b] = 1.0
        yield {
            "x": x[idx],
            "y": y[idx],
            "row_mask": row_mask,
        }
