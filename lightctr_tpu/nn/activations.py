"""Activation set — capability parity with ``util/activations.h:19-181``.

All plain jnp functions: XLA fuses them into adjacent matmuls, which
supersedes the reference's hand-fused forward/backward AVX pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def identity(x):
    return x


def sigmoid(x):
    """Sigmoid with the reference's +-16 input clamp (activations.h:63-76)
    — harmless in fp32 and keeps exact parity with dumped scores."""
    return jax.nn.sigmoid(jnp.clip(x, -16.0, 16.0))


def binary_sigmoid(x):
    """BNN-style hard binarization with straight-through gradient
    (capability of activations.h:37-61's Binary_Sigmoid experiment)."""
    hard = (x > 0).astype(x.dtype)
    return hard + (jax.nn.sigmoid(x) - jax.lax.stop_gradient(jax.nn.sigmoid(x)))


def softmax_t(x, temperature: float = 1.0, axis: int = -1):
    """Softmax with distillation temperature (activations.h:95-127)."""
    return jax.nn.softmax(x / temperature, axis=axis)


def tanh(x):
    return jnp.tanh(x)


def relu(x):
    return jnp.maximum(x, 0.0)


def softplus(x):
    return jax.nn.softplus(x)


ACTIVATIONS = {
    "identity": identity,
    "sigmoid": sigmoid,
    "binary_sigmoid": binary_sigmoid,
    "softmax": softmax_t,
    "tanh": tanh,
    "relu": relu,
    "softplus": softplus,
}
