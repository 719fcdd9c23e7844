"""Model ensembling — hard/soft voting and AdaBoost sample re-weighting.

Capability parity with util/ensembling.h (Voting :19-52, AdaBoost :55-108).
Scorers are arbitrary callables returning probabilities, so any model in
the zoo (or a GBM) can be a base learner.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def vote_hard(predictions: Sequence[np.ndarray]) -> np.ndarray:
    """Majority vote over class-label arrays [n_models][N]."""
    preds = np.stack(predictions)  # [M, N]
    n_classes = int(preds.max()) + 1
    counts = np.zeros((preds.shape[1], n_classes), np.int64)
    for p in preds:
        np.add.at(counts, (np.arange(len(p)), p.astype(np.int64)), 1)
    return counts.argmax(axis=1)


def vote_soft(probabilities: Sequence[np.ndarray], weights=None) -> np.ndarray:
    """Weighted probability averaging [n_models][N, C] -> [N, C]."""
    probs = np.stack(probabilities)
    if weights is None:
        return probs.mean(axis=0)
    w = np.asarray(weights, np.float64)
    w = w / w.sum()
    return np.einsum("m,mnc->nc", w, probs)


def adaboost(
    fit_fn: Callable[[np.ndarray, np.ndarray, np.ndarray], Callable],
    x: np.ndarray,
    y: np.ndarray,
    n_rounds: int = 10,
):
    """Binary AdaBoost (labels in {0,1}). `fit_fn(x, y, sample_weights)`
    returns a scorer `clf(x) -> {0,1}`. Returns (models, alphas)."""
    n = len(y)
    w = np.full(n, 1.0 / n)
    yy = 2.0 * y - 1.0  # {-1, +1}
    models, alphas = [], []
    for _ in range(n_rounds):
        clf = fit_fn(x, y, w)
        pred = clf(x)
        pp = 2.0 * pred - 1.0
        err = float(np.sum(w * (pred != y)))
        err = min(max(err, 1e-10), 1 - 1e-10)
        alpha = 0.5 * np.log((1 - err) / err)
        w = w * np.exp(-alpha * yy * pp)
        w = w / w.sum()
        models.append(clf)
        alphas.append(alpha)
        if err < 1e-9:
            break
    return models, np.asarray(alphas)


def adaboost_predict(models, alphas, x: np.ndarray) -> np.ndarray:
    score = np.zeros(len(x))
    for clf, a in zip(models, alphas):
        score += a * (2.0 * clf(x) - 1.0)
    return (score > 0).astype(np.int64)
