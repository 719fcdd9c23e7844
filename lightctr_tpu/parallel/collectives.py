"""Explicit collectives with wire compression — capability parity with the
reference's fp16 wire codec (common/float16.h + buffer.h:141-173) and int8
quantile compression (util/quantile_compress.h) applied to gradient
exchange.

On a single pod slice, GSPMD's automatic psum over ICI needs no
compression. These helpers exist for the DCN/host-staged regime the
reference's PS wire format targeted: cast-to-bf16 (or int8 with per-tensor
scale) around an explicit `lax.psum` inside `shard_map`.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


# CLI / config surface: --wire {f32,bf16,fp16,int8}
WIRE_DTYPES = {
    "f32": None,
    "bf16": jnp.bfloat16,
    "fp16": jnp.float16,
    "int8": jnp.int8,
}


def wire_psum(x: jax.Array, axis: str, wire_dtype) -> jax.Array:
    """psum with the payload cast to `wire_dtype` on the wire (None =
    exact). The product-path entry point for compressed exchange inside
    shard_map'd steps: the sharded_kernel streaming trainers route every
    rank-space pull/grad psum through here when built with wire= —
    replacing the reference PS's unconditional fp16 wire
    (/root/reference/LightCTR/common/buffer.h:141-173,
    paramserver.h:159-176). int8 exchanges a per-shard fp32 scale
    alongside the quantised payload (all_gather + dequantised sum —
    summing int8 directly would overflow and lose per-participant
    scales), mirroring the reference's quantile int8 codec capability
    (util/quantile_compress.h)."""
    return _compress_decompress_psum(x, axis, wire_dtype)


def _compress_decompress_psum(x: jax.Array, axis: str, wire_dtype) -> jax.Array:
    if wire_dtype is None:
        return jax.lax.psum(x, axis)
    if wire_dtype == jnp.int8:
        # symmetric per-tensor int8; scale exchanged alongside (fp32)
        scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        # all-gather quantised shards + scales, dequantise, sum: preserves
        # per-participant scales (summing int8 directly would overflow)
        qs = jax.lax.all_gather(q, axis)                 # [n, ...]
        ss = jax.lax.all_gather(scale, axis)             # [n]
        return jnp.tensordot(ss, qs.astype(jnp.float32), axes=(0, 0))
    return jax.lax.psum(x.astype(wire_dtype), axis).astype(x.dtype)


def psum_compressed(tree: Any, axis: str, wire_dtype=jnp.bfloat16) -> Any:
    """psum a pytree with values cast to `wire_dtype` on the wire.

    wire_dtype=None -> plain psum; jnp.bfloat16/float16 -> cast;
    jnp.int8 -> per-tensor symmetric quantisation (gather+dequant+sum).
    """
    return jax.tree_util.tree_map(
        lambda x: _compress_decompress_psum(x, axis, wire_dtype), tree
    )


def make_compressed_train_step(model, cfg, tx, mesh: Mesh, wire_dtype=jnp.bfloat16):
    """Data-parallel train step whose gradient exchange runs at
    `wire_dtype` precision (the reference's fp16 wire codec applied to
    the Ring-AllReduce replacement). Params replicated; returns a jitted
    (state, batch) -> (state, loss) like train.loop.make_train_step."""
    from .. import optim
    from ..train.loop import TrainState

    def loss_fn(params, batch):
        return model.loss(params, batch, cfg, None)

    grad_fn = make_compressed_dp_grad_fn(loss_fn, mesh, wire_dtype)

    @jax.jit
    def step(state: TrainState, batch: dict):
        loss, grads = grad_fn(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optim.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.rng), loss

    return step


def make_compressed_dp_grad_fn(loss_fn, mesh: Mesh, wire_dtype=jnp.bfloat16):
    """Data-parallel value_and_grad with compressed gradient exchange.

    Replicated params, batch sharded over `data`; each shard computes local
    grads, exchange happens at `wire_dtype` precision. Drop-in for the
    uncompressed autodiff+GSPMD path when wire bits matter (DCN).
    """

    def local(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        n = jax.lax.psum(1, "data")
        grads = psum_compressed(grads, "data", wire_dtype)
        grads = jax.tree_util.tree_map(lambda g: g / n, grads)
        loss = jax.lax.psum(loss, "data") / n
        return loss, grads

    def batch_spec(batch):
        return {k: P("data", *([None] * (jnp.ndim(v) - 1))) for k, v in batch.items()}

    def fn(params, batch):
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), params), batch_spec(batch)),
            out_specs=(P(), jax.tree_util.tree_map(lambda _: P(), params)),
            check_vma=False,
        )(params, batch)

    return fn
