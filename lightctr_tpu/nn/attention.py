"""Additive attention over sequence outputs — capability parity with the
reference's attention unit (train/unit/attention_unit.h:18-153): per-step
score = w2 . act(W1 h_t), softmax over time, weighted sum. Whole thing is
two batched matmuls + a softmax; backward is autodiff (the reference
hand-derives it at attention_unit.h:77-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_init(rng: jax.Array, dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    scale = 1.0 / jnp.sqrt(dim)
    return {
        "w1": (jax.random.normal(k1, (dim, hidden)) * scale).astype(dtype),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": (jax.random.normal(k2, (hidden, 1)) * (1.0 / jnp.sqrt(hidden))).astype(dtype),
    }


def attention_apply(params: dict, seq: jax.Array, mask: jax.Array | None = None):
    """seq: [B, T, D] -> (context [B, D], weights [B, T])."""
    scores = (jnp.tanh(seq @ params["w1"] + params["b1"]) @ params["w2"])[..., 0]  # [B,T]
    if mask is not None:
        scores = jnp.where(mask > 0, scores, -1e9)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bt,btd->bd", weights, seq)
    return context, weights
