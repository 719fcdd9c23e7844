"""Losses — capability parity with ``util/loss.h:17-86``.

All take raw logits (not probabilities): the fused
sigmoid/softmax-cross-entropy forms are the numerically stable TPU
equivalents of the reference's clamped log-loss + (pred - label) gradient
shortcut — JAX autodiff of these forms produces exactly (sigma(z) - y).
Each supports a per-example weight (row_mask) so padded rows drop out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wmean(x, weights):
    if weights is None:
        return jnp.mean(x)
    w = weights.reshape(x.shape)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def square_loss(logits, targets, weights=None):
    """0.5 * (pred - y)^2 (loss.h:20-34)."""
    return _wmean(0.5 * jnp.square(logits - targets), weights)


def logistic_loss(logits, labels, weights=None):
    """Stable sigmoid binary cross-entropy from logits (loss.h:50-63)."""
    z = logits
    y = labels
    # log(1 + exp(-|z|)) + max(z, 0) - z*y  — the standard stable form
    per = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return _wmean(per, weights)


def softmax_cross_entropy(logits, labels_onehot, weights=None):
    """Softmax CE from logits (loss.h:65-86, Logistic_Softmax)."""
    logz = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(labels_onehot * logz, axis=-1)
    return _wmean(per, weights)
