"""Streaming Wide&Deep trainer at PS scale — the last BASELINE-named
model family to get a production vocab-master path (FM r4, NFM r5).

Capability lineage: the reference's distributed W&D is THE model its
ParamServer cluster exists for (/root/reference/LightCTR/
distributed_algo_abst.h:106-117 — sparse wide LR + per-field embedding
sum -> FC tower; workers pull the batch's rows, push gradients,
the server applies the update). TPU-native redesign:

  packed master  [V, 32] = [w | v(K<=15) | pad | adagrad accum] — the
                 SAME row layout as the FM/NFM production masters, so
                 the partitioned exchange is shared verbatim
                 (fm_kernel.make_partitioned_pull_push).
  pull           one [R, 32] row gather on the batch's unique ids
                 (device-planned: ffm_kernel.plan_batch_on_device).
  compute        the deep tower needs per-(row, FIELD) embedding sums
                 [B, F, K]; the flat count-matrix C[(b,f), rank] (ONE
                 scalar scatter-add of B*L updates) turns the whole
                 gather+field-sum into S = C @ rows — a single MXU
                 matmul — and autodiff's backward C^T @ dS is the
                 scatter-free gradient. C is [B*F, R]: at L=64/F=68 it
                 caps the feasible batch near B<=1024 at production
                 capacities (19 GB at B=4096 — the shape math in
                 NEXT_STEPS); B=1024 runs production vocab (10M) in a
                 ~2.3 GB transient.
  update         row-sparse Adagrad on touched rows (server-side-update
                 analogue), Adam on the dense tower.

Trajectories: packed == partitioned by construction (shared core);
logits == models/widedeep.forward on transplanted params
(tests/test_widedeep_kernel.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.mlp import mlp_apply, mlp_init
from ..ops import fm_fused_pallas as K
from . import ffm_kernel
from .fm_kernel import make_partitioned_pull_push


@dataclasses.dataclass(frozen=True)
class KernelWDConfig:
    n_features: int
    n_fields: int
    embed_dim: int = 4            # <= 15 (packed [w | v] row is 16 wide)
    hidden: tuple = (50,)
    activation: str = "tanh"
    learning_rate: float = 0.05   # wide/embedding Adagrad
    mlp_learning_rate: float = 1e-3
    mlp_optimizer: str = "adam"
    init_std: float = 0.01
    l2: float = 0.0
    interpret: bool = False
    exact: bool = True

    def __post_init__(self):
        assert self.embed_dim <= K.D - 1, (
            f"embed_dim {self.embed_dim} exceeds the packed row "
            f"(w + {K.D - 1} factors)")


def _mlp_tx(cfg: KernelWDConfig):
    # duck-typed (mlp_optimizer + mlp_learning_rate) — one definition
    # for every tower-carrying kernel family
    from .nfm_kernel import _mlp_tx as _nfm_mlp_tx

    return _nfm_mlp_tx(cfg)


class StreamingWDStatePacked(NamedTuple):
    """[V, 32] packed master (table row 16 | adagrad accum 16) + the
    dense tower riding alongside — the NFM production state shape with
    W&D math."""

    w0: jax.Array
    w0_accum: jax.Array
    packed: jax.Array
    mlp: list
    mlp_opt: object


def streaming_init_packed(rng: jax.Array,
                          cfg: KernelWDConfig) -> StreamingWDStatePacked:
    k1, k2 = jax.random.split(rng)
    table = jnp.zeros((cfg.n_features, K.D))
    table = table.at[:, 1 : 1 + cfg.embed_dim].set(
        jax.random.normal(k1, (cfg.n_features, cfg.embed_dim))
        * cfg.init_std)
    mlp = mlp_init(k2, [cfg.n_fields * cfg.embed_dim, *cfg.hidden, 1])
    tx = _mlp_tx(cfg)
    return StreamingWDStatePacked(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        packed=jnp.concatenate(
            [table, jnp.zeros((cfg.n_features, K.D))], axis=1),
        mlp=mlp,
        mlp_opt=tx.init(mlp),
    )


def _logits_from_rank(cfg: KernelWDConfig, rows, w0, mlp, C, B: int):
    """W&D forward over rank-space rows: S = C @ [w|v] gives the wide
    partial sums AND the per-field embedding sums in one matmul —
    S[(b,f)] = [sum of w*x over field f | field-sum embedding]. Same
    math as models/widedeep.forward (field_sum_embeddings + linear_term),
    tested equal."""
    F, Kd = cfg.n_fields, cfg.embed_dim
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    S = jnp.einsum("pr,rd->pd", C, rows[:, : 1 + Kd].astype(cdt),
                   preferred_element_type=jnp.float32)   # [B*F, 1+K]
    S = S.reshape(B, F, 1 + Kd)
    wx = jnp.sum(S[..., 0], axis=-1)                     # [B]
    deep_in = S[..., 1:].reshape(B, F * Kd)
    deep = mlp_apply(mlp, deep_in, activation=cfg.activation)[:, 0]
    return w0 + wx + deep


def _wd_loss_and_grads(cfg: KernelWDConfig, rows, b, R: int, w0, mlp,
                       l2):
    """The drift-prone middle of every W&D step: count matrix +
    flat-agg forward + autodiff backward + L2, on REPLICATED rank rows.
    Shared by the packed/partitioned cores AND the sharded twin
    (parallel/sharded_kernel.make_sharded_streaming_wd_step), so the
    loss math can never diverge between them. Returns
    (loss, g_rows [R, D] incl. L2, g0, d_mlp) — callers apply their own
    ownership/validity masks and optimizer structure."""
    B, L = b["xv"].shape
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    C = ffm_kernel.count_matrix(b["ranks"], b["fields"], b["xv"], R,
                                cfg.n_fields, cdt)
    n_valid = jnp.maximum(jnp.sum(b["row_mask"]), 1.0)

    def loss_fn(rows, w0, mlp):
        z = _logits_from_rank(cfg, rows, w0, mlp, C, B)
        per = (jnp.maximum(z, 0) - z * b["labels"]
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * b["row_mask"]) / n_valid

    loss, (g_rows, g0, d_mlp) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2))(rows, w0, mlp)
    return loss, g_rows + l2 * rows, g0, d_mlp


def _rank_core_wd(cfg: KernelWDConfig, tx, pulled, b, R: int,
                  w0, w0_accum, mlp, mlp_opt, lr, l2):
    """pull -> flat-agg forward/backward -> row-sparse Adagrad + tower
    Adam, in RANK space on the [R, 32] pulled rows. Shared by the
    packed and partitioned steps (trajectory-identical by
    construction)."""
    from .. import optim

    D = K.D
    n_unique = b["n_unique"]
    rows = pulled[:, :D]
    acc = pulled[:, D:]
    rows = rows.at[R - 1].set(0.0)   # padding rank reads zero

    loss, g_rows, g0, d_mlp = _wd_loss_and_grads(cfg, rows, b, R, w0,
                                                 mlp, l2)

    pos = jnp.arange(R)
    m = (pos < n_unique).astype(jnp.float32)[:, None]
    g = g_rows * m
    acc_new = acc + g * g
    rows_new = rows - lr * g / (jnp.sqrt(acc_new) + 1e-7)

    mlp_updates, mlp_opt = tx.update(d_mlp, mlp_opt, mlp)
    mlp = optim.apply_updates(mlp, mlp_updates)

    w0_accum_new = w0_accum + g0 * g0
    w0_new = w0 - lr * g0 / (jnp.sqrt(w0_accum_new) + 1e-7)
    return (jnp.concatenate([rows_new, acc_new], axis=1), w0_new,
            w0_accum_new, mlp, mlp_opt, loss)


def make_streaming_train_step_packed(cfg: KernelWDConfig, capacity: int):
    """Packed-master streaming W&D: ONE [R, 32] gather + ONE scatter-set
    per step around the flat-agg core."""
    R = capacity
    tx = _mlp_tx(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingWDStatePacked, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]
        pulled = state.packed[uids]
        packed_new, w0, w0_accum, mlp, mlp_opt, loss = _rank_core_wd(
            cfg, tx, pulled, b, R, state.w0, state.w0_accum, state.mlp,
            state.mlp_opt, lr, l2)
        pos = jnp.arange(R)
        safe_uids = jnp.where(pos < n_unique, uids,
                              state.packed.shape[0])
        packed = state.packed.at[safe_uids].set(packed_new, mode="drop")
        return StreamingWDStatePacked(w0, w0_accum, packed, mlp,
                                      mlp_opt), loss

    return step


class StreamingWDStatePartitioned(NamedTuple):
    """Range-PARTITIONED packed W&D master (see fm_kernel.
    StreamingFMStatePartitioned for the layout and the donation/
    overflow contract)."""

    w0: jax.Array
    w0_accum: jax.Array
    parts: tuple
    mlp: list
    mlp_opt: object


def partition_streaming_state(state: StreamingWDStatePacked,
                              bounds: tuple) -> StreamingWDStatePartitioned:
    from .fm_kernel import split_packed_by_bounds

    return StreamingWDStatePartitioned(
        state.w0, state.w0_accum,
        split_packed_by_bounds(state.packed, bounds), state.mlp,
        state.mlp_opt)


def departition_streaming_state(
        state: StreamingWDStatePartitioned) -> StreamingWDStatePacked:
    return StreamingWDStatePacked(
        state.w0, state.w0_accum, jnp.concatenate(state.parts, axis=0),
        state.mlp, state.mlp_opt)


def make_streaming_train_step_partitioned(cfg: KernelWDConfig,
                                          capacity: int, bounds: tuple,
                                          caps: tuple):
    """W&D against the range-partitioned master — the FM exchange
    verbatim around the flat-agg core. Returns step(state, b, hyper)
    -> ((state, loss), overflow)."""
    R = capacity
    assert len(bounds) == len(caps) and bounds[-1] == cfg.n_features
    tx = _mlp_tx(cfg)
    pull, push = make_partitioned_pull_push(cfg.n_features, R, bounds,
                                            caps)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingWDStatePartitioned, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        pulled, starts, idx_ext, overflow = pull(state.parts, b)
        packed_new, w0, w0_accum, mlp, mlp_opt, loss = _rank_core_wd(
            cfg, tx, pulled, b, R, state.w0, state.w0_accum, state.mlp,
            state.mlp_opt, lr, l2)
        new_parts = push(state.parts, packed_new, starts, idx_ext)
        return (StreamingWDStatePartitioned(w0, w0_accum, new_parts,
                                            mlp, mlp_opt), loss), overflow

    return step


def make_streaming_train_step_fused(cfg: KernelWDConfig, capacity: int):
    """ONE-dispatch streaming W&D on raw [B, L] batches (the FFM device
    planner carries fields)."""
    assert cfg.n_features < 2**31 - 1, (
        "device planner is int32 with INT32_MAX as the pad sentinel")
    inner = make_streaming_train_step_packed(cfg, capacity)
    # trace through the jitted wrappers (their donation marks don't apply
    # inside an outer jit); donation lives on THIS boundary instead —
    # the same composition as fm_kernel.make_streaming_train_step_fused
    inner_raw = inner.__wrapped__
    plan_raw = ffm_kernel.plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingWDStatePacked, ids, vals, mask, fields,
             labels, row_mask, hyper=None):
        b = plan_raw(ids, vals, mask, fields, labels, row_mask,
                     capacity=capacity)
        return inner_raw(state, b, hyper)

    return step


def make_streaming_train_step_fused_partitioned(cfg: KernelWDConfig,
                                                capacity: int,
                                                bounds: tuple,
                                                caps: tuple):
    """ONE-dispatch W&D step on raw [B, L] batches against the
    range-partitioned master (device planner traced in). Returns
    step(state, ids, vals, mask, fields, labels, row_mask, hyper) ->
    ((state, loss), overflow)."""
    assert cfg.n_features < 2**31 - 1, (
        "device planner is int32 with INT32_MAX as the pad sentinel")
    inner = make_streaming_train_step_partitioned(cfg, capacity, bounds,
                                                  caps)
    inner_raw = inner.__wrapped__
    plan_raw = ffm_kernel.plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingWDStatePartitioned, ids, vals, mask, fields,
             labels, row_mask, hyper=None):
        b = plan_raw(ids, vals, mask, fields, labels, row_mask,
                     capacity=capacity)
        return inner_raw(state, b, hyper)

    return step


def export_streaming_params(state: StreamingWDStatePacked,
                            cfg: KernelWDConfig) -> dict:
    """-> params dict usable with models/widedeep.forward (vocab space)."""
    table = np.asarray(state.packed[:, : K.D])
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(table[:, 0]),
        "embed": jnp.asarray(table[:, 1 : 1 + cfg.embed_dim]),
        "mlp": state.mlp,
    }
