"""Batch scoring — the TPU serving path (reference: predict/fm_predict.cpp
scorer semantics: score a test file, report logloss/accuracy/AUC, dump
predictions; without replicating the reference loader's dropped-first-
feature quirk, fm_predict.cpp:117-127).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax

from ..data.batching import sparse_batches
from ..data.libffm import SparseDataset
from ..nn.activations import sigmoid
from ..utils.metrics import MetricAccumulator


def make_scorer(model, cfg, params) -> Callable:
    @jax.jit
    def score(batch):
        return sigmoid(model.forward(params, batch, cfg))

    return score


def batch_score(
    model,
    cfg,
    params,
    ds: SparseDataset,
    batch_size: int = 512,
    dump_path: str | None = None,
) -> dict:
    """Score a dataset; returns {auc, logloss, accuracy}; optionally dumps
    one probability per line (reference prediction dump format,
    fm_predict.cpp:79-89)."""
    score = make_scorer(model, cfg, params)
    acc = MetricAccumulator()
    preds: list[np.ndarray] = []
    for batch in sparse_batches(ds, batch_size):
        s = np.asarray(score(batch))
        m = np.asarray(batch["row_mask"]) > 0
        acc.update(s[m], np.asarray(batch["labels"])[m])
        preds.append(s[m])
    if dump_path:
        allp = np.concatenate(preds)
        with open(dump_path, "w") as f:
            for p in allp:
                f.write(f"{float(p):.6f}\n")
    return acc.result()
