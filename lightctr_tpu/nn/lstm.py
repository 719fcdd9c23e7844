"""LSTM over sequences via lax.scan — capability parity with the
reference's hand-rolled cell + BPTT (train/unit/lstm_unit.h:42-376).

The four gate matmuls are fused into one [D+H, 4H] GEMM (MXU-friendly),
and backprop-through-time falls out of autodiff over the scan instead of
the reference's manual reverse pass (lstm_unit.h:169-276).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_init(rng: jax.Array, input_dim: int, hidden_dim: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    scale = 1.0 / jnp.sqrt(input_dim + hidden_dim)
    return {
        "wx": (jax.random.normal(k1, (input_dim, 4 * hidden_dim)) * scale).astype(dtype),
        "wh": (jax.random.normal(k2, (hidden_dim, 4 * hidden_dim)) * scale).astype(dtype),
        # forget-gate bias +1 (standard; improves gradient flow)
        "b": jnp.concatenate(
            [
                jnp.zeros((hidden_dim,), dtype),
                jnp.ones((hidden_dim,), dtype),
                jnp.zeros((2 * hidden_dim,), dtype),
            ]
        ),
    }


def lstm_apply(params: dict, xs: jax.Array, h0=None, c0=None):
    """xs: [B, T, D] -> (outputs [B, T, H], (hT, cT)).

    Gate order: input, forget, gate(candidate), output.
    """
    B, T, D = xs.shape
    H = params["wh"].shape[0]
    h = jnp.zeros((B, H), xs.dtype) if h0 is None else h0
    c = jnp.zeros((B, H), xs.dtype) if c0 is None else c0

    def step(carry, x_t):
        h, c = carry
        z = x_t @ params["wx"] + h @ params["wh"] + params["b"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h, c), outs = jax.lax.scan(step, (h, c), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(outs, 0, 1), (h, c)
