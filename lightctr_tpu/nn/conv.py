"""Conv / pooling via lax.conv_general_dilated — capability parity with the
reference's Matrix::convolution + Conv_Layer/Max_Pooling_Layer
(util/matrix.h:237-334, train/layer/convLayer.h:33-271,
poolingLayer.h:22-116). XLA lowers these straight onto the MXU; the
reference's LeNet-style sparse connection mask (convLayer.h:18-25) is
expressed as an optional multiplicative kernel mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv_init(
    rng: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: int,
    connection_mask: np.ndarray | None = None,
    dtype=jnp.float32,
) -> dict:
    scale = 1.0 / np.sqrt(in_ch * kernel * kernel)
    p = {
        "w": (jax.random.normal(rng, (out_ch, in_ch, kernel, kernel)) * scale).astype(dtype),
        "b": jnp.zeros((out_ch,), dtype),
    }
    if connection_mask is not None:
        # [out_ch, in_ch] 0/1 — LeNet-style sparse connectivity
        p["conn_mask"] = jnp.asarray(connection_mask, dtype)[:, :, None, None]
    return p


def conv_apply(params: dict, x: jax.Array, stride: int = 1, padding: str = "VALID"):
    """x: [B, C, H, W] (NCHW) -> [B, O, H', W']."""
    w = params["w"]
    if "conn_mask" in params:
        w = w * params["conn_mask"]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + params["b"][None, :, None, None]


def max_pool(x: jax.Array, size: int = 2, stride: int | None = None):
    """Max-pool NCHW; backward (argmax routing) is autodiff'd, replacing the
    reference's explicit unpooling mask (poolingLayer.h:60-100)."""
    stride = stride or size
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, size, size),
        window_strides=(1, 1, stride, stride),
        padding="VALID",
    )
