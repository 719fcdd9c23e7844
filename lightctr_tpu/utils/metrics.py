"""Evaluation metrics — jit-friendly, O(buckets) memory.

Histogram AUC with the same trapezoid construction as the reference's
``AucEvaluator`` (``util/evaluator.h:51-103``), but vectorised as a
scatter-add + cumulative sum rather than a serial bucket walk, which maps
onto the VPU. Bucket count configurable (reference fixes 2^24; 2^20 keeps
identical results on datasets of this size at 16x less memory).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def auc(
    scores: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
    n_buckets: int = 1 << 20,
) -> jax.Array:
    """Bucketed AUC over sigmoid scores in [0, 1].

    Scatter probabilities into `n_buckets` histogram cells split by label,
    then AUC = sum over thresholds of trapezoid areas — computed as
    pairs-above + half ties, normalised by pos*neg pairs.
    """
    scores = jnp.asarray(scores, jnp.float32).reshape(-1)
    labels = jnp.asarray(labels, jnp.float32).reshape(-1)
    w = jnp.ones_like(scores) if weights is None else jnp.asarray(weights, jnp.float32).reshape(-1)

    idx = jnp.clip((scores * n_buckets).astype(jnp.int32), 0, n_buckets - 1)
    pos = jnp.zeros((n_buckets,), jnp.float32).at[idx].add(labels * w)
    neg = jnp.zeros((n_buckets,), jnp.float32).at[idx].add((1.0 - labels) * w)

    # For each positive in bucket b: pairs won = negatives in buckets < b,
    # ties (half credit) = negatives in bucket b.
    neg_below = jnp.cumsum(neg) - neg
    won = jnp.sum(pos * neg_below) + 0.5 * jnp.sum(pos * neg)
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    denom = n_pos * n_neg
    return jnp.where(denom > 0, won / denom, jnp.float32(0.5))


def logloss(
    scores: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
    eps: float = 1e-7,
) -> jax.Array:
    """Mean binary cross-entropy over probability scores.

    Numerically matches the reference's clamped log-loss
    (``util/loss.h:50-63``) via probability clipping.
    """
    scores = jnp.clip(jnp.asarray(scores, jnp.float32).reshape(-1), eps, 1.0 - eps)
    labels = jnp.asarray(labels, jnp.float32).reshape(-1)
    w = jnp.ones_like(scores) if weights is None else jnp.asarray(weights, jnp.float32).reshape(-1)
    ll = -(labels * jnp.log(scores) + (1.0 - labels) * jnp.log(1.0 - scores))
    return jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)


def accuracy(
    scores: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
    threshold: float = 0.5,
) -> jax.Array:
    scores = jnp.asarray(scores, jnp.float32).reshape(-1)
    labels = jnp.asarray(labels, jnp.float32).reshape(-1)
    w = jnp.ones_like(scores) if weights is None else jnp.asarray(weights, jnp.float32).reshape(-1)
    pred = (scores >= threshold).astype(jnp.float32)
    hit = (pred == labels).astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def precision_recall_f1(scores, labels, threshold: float = 0.5):
    """P/R/F1 triple (semantics of ``util/evaluator.h:27-49``)."""
    scores = jnp.asarray(scores, jnp.float32).reshape(-1)
    labels = jnp.asarray(labels, jnp.float32).reshape(-1)
    pred = (scores >= threshold).astype(jnp.float32)
    tp = jnp.sum(pred * labels)
    fp = jnp.sum(pred * (1.0 - labels))
    fn = jnp.sum((1.0 - pred) * labels)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return precision, recall, f1


@dataclasses.dataclass
class MetricAccumulator:
    """Streaming accumulator: feed (scores, labels) per eval batch on host,
    finalise AUC/logloss/accuracy once — avoids materialising giant arrays."""

    n_buckets: int = 1 << 20

    def __post_init__(self):
        self._pos = np.zeros((self.n_buckets,), np.float64)
        self._neg = np.zeros((self.n_buckets,), np.float64)
        self._ll_sum = 0.0
        self._hit = 0.0
        self._n = 0.0

    def update(self, scores, labels, weights=None):
        scores = np.asarray(scores, np.float64).reshape(-1)
        labels = np.asarray(labels, np.float64).reshape(-1)
        w = np.ones_like(scores) if weights is None else np.asarray(weights, np.float64).reshape(-1)
        idx = np.clip((scores * self.n_buckets).astype(np.int64), 0, self.n_buckets - 1)
        np.add.at(self._pos, idx, labels * w)
        np.add.at(self._neg, idx, (1.0 - labels) * w)
        p = np.clip(scores, 1e-7, 1 - 1e-7)
        self._ll_sum += float(np.sum(w * -(labels * np.log(p) + (1 - labels) * np.log(1 - p))))
        self._hit += float(np.sum(w * ((scores >= 0.5) == (labels >= 0.5))))
        self._n += float(np.sum(w))

    def result(self) -> dict:
        neg_below = np.cumsum(self._neg) - self._neg
        won = np.sum(self._pos * neg_below) + 0.5 * np.sum(self._pos * self._neg)
        denom = self._pos.sum() * self._neg.sum()
        return {
            "auc": float(won / denom) if denom > 0 else 0.5,
            "logloss": self._ll_sum / max(self._n, 1.0),
            "accuracy": self._hit / max(self._n, 1.0),
        }
