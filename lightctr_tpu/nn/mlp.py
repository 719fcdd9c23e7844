"""Dense MLP tower — the TPU equivalent of the reference's
``Fully_Conn_Layer`` chain (fullyconnLayer.h:17-237).

Pure functional: params are a list of {"w","b"} dicts; dropout is inverted
dropout re-sampled per call from an explicit rng (the reference re-samples
its per-output dropout mask each batch, fullyconnLayer.h:199-201).
Gradient clipping / L2 live in the optimizer chain, not here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .activations import ACTIVATIONS


def mlp_init(
    rng: jax.Array,
    sizes: Sequence[int],
    dtype=jnp.float32,
    scale: str = "glorot",
) -> list[dict]:
    """sizes = [in, h1, ..., out]."""
    params = []
    keys = jax.random.split(rng, len(sizes) - 1)
    for k, fan_in, fan_out in zip(keys, sizes[:-1], sizes[1:]):
        if scale == "glorot":
            std = jnp.sqrt(2.0 / (fan_in + fan_out))
        else:
            std = 1.0 / jnp.sqrt(fan_in)
        params.append(
            {
                "w": (jax.random.normal(k, (fan_in, fan_out)) * std).astype(dtype),
                "b": jnp.zeros((fan_out,), dtype),
            }
        )
    return params


def mlp_apply(
    params: list[dict],
    x: jax.Array,
    activation: str = "relu",
    final_activation: str = "identity",
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
) -> jax.Array:
    act = ACTIVATIONS[activation]
    final_act = ACTIVATIONS[final_activation]
    n = len(params)
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        last = i == n - 1
        x = final_act(x) if last else act(x)
        if not last and train and dropout_rate > 0.0 and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    return x
