"""NFM trainer on the fused Pallas kernels.

Reuses the FM forward kernel (its row sums ARE the bi-interaction
ingredients: s = sum(vx), ss = sum(vx^2)) and the generalised dual
backward (ops/fm_fused_pallas.py): the MLP tower runs in plain XLA on the
tiny [B, K] pooled tensor with autodiff supplying g_pool, which packs into
the kernel duals as a = g_pool*s, b = g_pool.

Capability: the reference Train_NFM_Algo (train_nfm_algo.cpp:78-160) —
wide linear + bi-interaction pooling + FC tower, joint wide/deep grads —
at fused-kernel speed (the reference runs this model single-threaded,
train_nfm_algo.h:25).
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
from ..ops.embedding_pallas import WTILE
from .fm_kernel import (  # shared plan machinery + kernel dispatch
    BatchPlan,
    kernel_backward,
    kernel_forward,
    plan_batch,
)


@dataclasses.dataclass(frozen=True)
class KernelNFMConfig:
    n_features: int
    factor: int = 8
    hidden: tuple = (32,)
    activation: str = "relu"
    learning_rate: float = 0.05
    mlp_learning_rate: float = 1e-3
    # tower optimizer: "adam" (our default) or "adagrad" — the reference
    # tower uses PER-LAYER Adagrad (fullyconnLayer.h:234, applied in
    # applyBatchGradient with the global lr); the adagrad option exists
    # to settle the NFM head-to-head convergence gap under MATCHED
    # optimizers (PARITY.md NFM section, VERDICT r3 weak #3)
    mlp_optimizer: str = "adam"
    init_std: float = 0.01
    l2: float = 0.0
    interpret: bool = False
    exact: bool = True
    # fine=True: 5x128-row gather/scatter windows + merged backward+scatter
    # (see KernelFMConfig.fine); needs plan_batch(..., fine=True) /
    # capacity % 640 == 0 for the streaming step
    fine: bool = False
    # xmat=True (full-batch only): design-matrix step — s/ss/backward as
    # dense matmuls against the plan-constant Crow/Crow2 count matrices
    # (see KernelFMConfig.xmat); the MLP tower rides autodiff as usual
    xmat: bool = False


def _mlp_tx(cfg: KernelNFMConfig):
    from .. import optim

    if cfg.mlp_optimizer == "adagrad":
        # reference tower semantics: per-layer Adagrad with the shared lr
        # (fullyconnLayer.h:234); our tree-wise adagrad is per-parameter,
        # which subsumes per-layer accumulators
        return optim.adagrad(cfg.mlp_learning_rate)
    if cfg.mlp_optimizer != "adam":
        raise ValueError(f"unknown mlp_optimizer {cfg.mlp_optimizer!r}")
    return optim.adam(cfg.mlp_learning_rate)


class KernelNFMState(NamedTuple):
    w0: jax.Array
    w0_accum: jax.Array
    rows: jax.Array
    accum: jax.Array
    mlp: list
    mlp_opt: object


def init(rng: jax.Array, cfg: KernelNFMConfig, plan: BatchPlan) -> KernelNFMState:
    from .. import optim

    R = plan.n_rows_pad
    k1, k2 = jax.random.split(rng)
    rows = jnp.zeros((R, K.D))
    rows = rows.at[:, 1 : 1 + cfg.factor].set(
        jax.random.normal(k1, (R, cfg.factor)) * cfg.init_std
    )
    rows = rows.at[R - 1].set(0.0)
    mlp = mlp_init(k2, [cfg.factor, *cfg.hidden, 1])
    tx = _mlp_tx(cfg)
    return KernelNFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        rows=rows,
        accum=jnp.zeros((R, K.D)),
        mlp=mlp,
        mlp_opt=tx.init(mlp),
    )


def make_train_step(cfg: KernelNFMConfig, plan: BatchPlan):
    from .. import optim

    n_k = cfg.factor
    b_pad = plan.b_pad
    R = plan.n_rows_pad
    B = plan.labels.shape[0]
    tx = _mlp_tx(cfg)

    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows

    if cfg.fine and plan.tile_base_fine is None:
        raise ValueError("cfg.fine=True needs plan_batch(..., fine=True)")

    if cfg.xmat:
        from .fm_kernel import count_matrices

        R_ = plan.n_rows_pad
        cdt = jnp.float32 if cfg.exact else jnp.bfloat16
        Crow32, Crow2_32 = count_matrices(plan)
        Crow = Crow32.astype(cdt)
        Crow2 = Crow2_32.astype(cdt)

        def xmat_loss(rows, mlp, w0):
            # NOTE: the FM xmat path folds wx into the s matmul (one Crow
            # pass); here that fold MEASURED SLOWER (0.93 vs 0.55 ms on
            # v5e — the [b, 1+k] slice feeding the MLP defeats XLA's
            # schedule), so wx stays a separate matvec. PARITY.md log.
            w = rows[:, 0]
            V = rows[:, 1 : 1 + n_k]
            wx = jnp.einsum("br,r->b", Crow, w.astype(cdt),
                            preferred_element_type=jnp.float32)
            s = jnp.einsum("br,rk->bk", Crow, V.astype(cdt),
                           preferred_element_type=jnp.float32)
            ss = jnp.einsum("br,rk->bk", Crow2, (V * V).astype(cdt),
                            preferred_element_type=jnp.float32)
            pooled = 0.5 * (s * s - ss)
            deep = mlp_apply(mlp, pooled, activation=cfg.activation)[:, 0]
            z = w0 + wx + deep
            per = (jnp.maximum(z, 0) - z * labels_p
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
            return jnp.sum(per * rmask_p) / n_valid

        @jax.jit
        def xmat_step(state: KernelNFMState, hyper=None):
            lr = cfg.learning_rate if hyper is None else hyper[0]
            l2 = cfg.l2 if hyper is None else hyper[1]
            loss, (grad_rows, d_mlp, g0) = jax.value_and_grad(
                xmat_loss, argnums=(0, 1, 2)
            )(state.rows, state.mlp, state.w0)
            grad_rows = grad_rows + l2 * state.rows
            accum = state.accum + grad_rows * grad_rows
            rows = state.rows - lr * grad_rows / (jnp.sqrt(accum) + 1e-7)
            rows = rows.at[R_ - 1].set(0.0)
            mlp_updates, mlp_opt = tx.update(d_mlp, state.mlp_opt, state.mlp)
            mlp = optim.apply_updates(state.mlp, mlp_updates)
            w0_accum = state.w0_accum + g0 * g0
            w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
            return KernelNFMState(w0, w0_accum, rows, accum, mlp, mlp_opt), loss

        return xmat_step

    @jax.jit
    def step(state: KernelNFMState, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        rowsum, e_pos = kernel_forward(
            cfg, state.rows, plan.ranks_sorted, plan.rowid_sorted,
            plan.xv_sorted, plan.tile_base, plan.tile_base_fine, b_pad,
        )
        wx = rowsum[:, 0]
        s = rowsum[:, 1 : 1 + n_k]
        ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
        pooled = 0.5 * (s * s - ss)                     # [b_pad, K]

        def deep_fn(mlp, pooled):
            return mlp_apply(mlp, pooled, activation=cfg.activation)[:, 0]

        deep, deep_vjp = jax.vjp(deep_fn, state.mlp, pooled)
        logits = state.w0 + wx + deep
        z = logits
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid

        d_mlp, d_pooled = deep_vjp(dlogit)
        g_pool = d_pooled                                # [b_pad, K]

        duals = jnp.zeros((b_pad, K.S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1 : 1 + n_k].set(g_pool * s)
        duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(g_pool)

        grad_rows = kernel_backward(
            cfg, plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
            plan.ranks_sorted, plan.tile_base, plan.tile_base_fine,
            b_pad, R,
        )
        grad_rows = grad_rows + l2 * state.rows

        accum = state.accum + grad_rows * grad_rows
        rows = state.rows - lr * grad_rows / (jnp.sqrt(accum) + 1e-7)
        rows = rows.at[R - 1].set(0.0)

        mlp_updates, mlp_opt = tx.update(d_mlp, state.mlp_opt, state.mlp)
        mlp = optim.apply_updates(state.mlp, mlp_updates)

        g0 = jnp.sum(dlogit)
        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return KernelNFMState(w0, w0_accum, rows, accum, mlp, mlp_opt), loss

    return step


class StreamingNFMState(NamedTuple):
    """Master tables in VOCAB space (ranks are per-batch labels only)."""

    w0: jax.Array
    w0_accum: jax.Array
    table: jax.Array   # [V, 16] packed [w | v | pad]
    accum: jax.Array   # [V, 16] adagrad accumulator
    mlp: list
    mlp_opt: object


def streaming_init(rng: jax.Array, cfg: KernelNFMConfig) -> StreamingNFMState:
    from .. import optim

    k1, k2 = jax.random.split(rng)
    table = jnp.zeros((cfg.n_features, K.D))
    table = table.at[:, 1 : 1 + cfg.factor].set(
        jax.random.normal(k1, (cfg.n_features, cfg.factor)) * cfg.init_std
    )
    mlp = mlp_init(k2, [cfg.factor, *cfg.hidden, 1])
    tx = _mlp_tx(cfg)
    return StreamingNFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        table=table,
        accum=jnp.zeros((cfg.n_features, K.D)),
        mlp=mlp,
        mlp_opt=tx.init(mlp),
    )


def make_streaming_train_step(cfg: KernelNFMConfig, capacity: int, b_pad: int):
    """Minibatch-streaming kernel NFM: one compiled program serves every
    batch (same pull -> fused kernels -> row-sparse push cycle as
    fm_kernel.make_streaming_train_step, plus the XLA MLP tower on the
    pooled [B, K] tensor with Adam)."""
    from .. import optim

    n_k = cfg.factor
    R = capacity
    if cfg.fine:
        assert R % (5 * WTILE) == 0, (
            f"cfg.fine streaming needs capacity % 640 == 0, got {R}"
        )
    tx = _mlp_tx(cfg)

    # donate: the vocab-space master tables update in place (no full-table
    # copy per step — see fm_kernel.make_streaming_train_step)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMState, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        uids = b["uids"]
        n_unique = b["n_unique"]
        rows = state.table[uids]                # "pull" unique rows
        rows = rows.at[R - 1].set(0.0)

        rowsum, e_pos = kernel_forward(
            cfg, rows, b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
            b["tile_base"], b.get("tile_base_fine"), b_pad,
        )
        wx = rowsum[:, 0]
        s = rowsum[:, 1 : 1 + n_k]
        ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
        pooled = 0.5 * (s * s - ss)

        def deep_fn(mlp, pooled):
            return mlp_apply(mlp, pooled, activation=cfg.activation)[:, 0]

        deep, deep_vjp = jax.vjp(deep_fn, state.mlp, pooled)
        z = state.w0 + wx + deep
        labels_p = b["labels_padded"]
        rmask_p = b["row_mask_padded"]
        n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid

        d_mlp, g_pool = deep_vjp(dlogit)
        duals = jnp.zeros((b_pad, K.S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1 : 1 + n_k].set(g_pool * s)
        duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(g_pool)

        grad_rows = kernel_backward(
            cfg, b["rowid_sorted"], b["xv_sorted"], e_pos, duals,
            b["ranks_sorted"], b["tile_base"], b.get("tile_base_fine"),
            b_pad, R,
        )
        grad_rows = grad_rows + l2 * rows

        # row-sparse adagrad "push": padding rows redirected out of bounds
        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        safe_uids = jnp.where(pos < n_unique, uids, state.table.shape[0])
        g = grad_rows * m
        acc_rows = state.accum[uids] + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        accum = state.accum.at[safe_uids].set(acc_rows, mode="drop")
        table = state.table.at[safe_uids].add(-upd, mode="drop")

        mlp_updates, mlp_opt = tx.update(d_mlp, state.mlp_opt, state.mlp)
        mlp = optim.apply_updates(state.mlp, mlp_updates)

        g0 = jnp.sum(dlogit)
        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return StreamingNFMState(w0, w0_accum, table, accum, mlp, mlp_opt), loss

    return step


class StreamingNFMStatePacked(NamedTuple):
    """NFM streaming state with table+accum interleaved as ONE [V, 32]
    array — the packed-master layout the FM production path uses
    (fm_kernel.StreamingFMStatePacked: vocab-scale gather/scatter is
    per-ROW bound, so one [R, 32] gather + one scatter-set beats the
    unpacked 2+2, benchmarks/bench_gather_cost.py). MLP tower state
    rides alongside (dense, tiny, updated every step)."""

    w0: jax.Array
    w0_accum: jax.Array
    packed: jax.Array  # [V, 32] = [table row (16) | adagrad accum (16)]
    mlp: list
    mlp_opt: object


def pack_streaming_state(state: StreamingNFMState) -> StreamingNFMStatePacked:
    return StreamingNFMStatePacked(
        w0=state.w0, w0_accum=state.w0_accum,
        packed=jnp.concatenate([state.table, state.accum], axis=1),
        mlp=state.mlp, mlp_opt=state.mlp_opt,
    )


def unpack_streaming_state(state: StreamingNFMStatePacked) -> StreamingNFMState:
    return StreamingNFMState(
        w0=state.w0, w0_accum=state.w0_accum,
        table=state.packed[:, : K.D], accum=state.packed[:, K.D :],
        mlp=state.mlp, mlp_opt=state.mlp_opt,
    )


def streaming_init_packed(rng: jax.Array,
                          cfg: KernelNFMConfig) -> StreamingNFMStatePacked:
    return pack_streaming_state(streaming_init(rng, cfg))


def _packed_rank_core_nfm(cfg: KernelNFMConfig, tx, pulled, b, b_pad: int,
                          R: int, w0, w0_accum, mlp, mlp_opt, lr, l2):
    """The pull->compute->update middle of the packed streaming NFM step
    in RANK space (fm_kernel._packed_rank_core with the MLP tower on the
    pooled tensor spliced between forward and duals). Shared verbatim by
    the packed single-master and range-partitioned steps so their
    trajectories are identical by construction."""
    from .. import optim

    n_k = cfg.factor
    D = K.D
    n_unique = b["n_unique"]
    rows = pulled[:, :D]
    acc = pulled[:, D:]
    rows = rows.at[R - 1].set(0.0)

    rowsum, e_pos = kernel_forward(
        cfg, rows, b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
        b["tile_base"], b.get("tile_base_fine"), b_pad,
    )
    wx = rowsum[:, 0]
    s = rowsum[:, 1 : 1 + n_k]
    ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
    pooled = 0.5 * (s * s - ss)

    def deep_fn(mlp, pooled):
        return mlp_apply(mlp, pooled, activation=cfg.activation)[:, 0]

    deep, deep_vjp = jax.vjp(deep_fn, mlp, pooled)
    z = w0 + wx + deep
    labels_p = b["labels_padded"]
    rmask_p = b["row_mask_padded"]
    n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
    per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
    loss = jnp.sum(per * rmask_p) / n_valid
    dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid

    d_mlp, g_pool = deep_vjp(dlogit)
    duals = jnp.zeros((b_pad, K.S))
    duals = duals.at[:, 0].set(dlogit)
    duals = duals.at[:, 1 : 1 + n_k].set(g_pool * s)
    duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(g_pool)

    grad_rows = kernel_backward(
        cfg, b["rowid_sorted"], b["xv_sorted"], e_pos, duals,
        b["ranks_sorted"], b["tile_base"], b.get("tile_base_fine"),
        b_pad, R,
    )
    grad_rows = grad_rows + l2 * rows

    pos = jnp.arange(R)
    m = (pos < n_unique).astype(jnp.float32)[:, None]
    g = grad_rows * m
    acc_new = acc + g * g
    rows_new = rows - lr * g / (jnp.sqrt(acc_new) + 1e-7)

    mlp_updates, mlp_opt = tx.update(d_mlp, mlp_opt, mlp)
    mlp = optim.apply_updates(mlp, mlp_updates)

    g0 = jnp.sum(dlogit)
    w0_accum_new = w0_accum + g0 * g0
    w0_new = w0 - lr * g0 / (jnp.sqrt(w0_accum_new) + 1e-7)
    return (jnp.concatenate([rows_new, acc_new], axis=1), w0_new,
            w0_accum_new, mlp, mlp_opt, loss)


def make_streaming_train_step_packed(cfg: KernelNFMConfig, capacity: int,
                                     b_pad: int):
    """Packed-layout twin of make_streaming_train_step: ONE master-table
    gather and ONE scatter-set per step. Identical numerics — the
    scatter-set writes rows_pulled - update, which equals the unpacked
    scatter-add because uids are unique
    (tests/test_nfm_kernel.py::test_nfm_packed_streaming_matches_unpacked).
    The NFM production regime BASELINE.json configs 4-5 center on
    (reference: the PS cluster trains W&D/NFM-style sparse+dense models,
    /root/reference/LightCTR/distributed_algo_abst.h:93-349)."""
    R = capacity
    if cfg.fine:
        assert R % (5 * WTILE) == 0, (
            f"cfg.fine streaming needs capacity % 640 == 0, got {R}"
        )
    tx = _mlp_tx(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMStatePacked, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]
        pulled = state.packed[uids]             # ONE [R, 32] gather
        packed_new, w0, w0_accum, mlp, mlp_opt, loss = \
            _packed_rank_core_nfm(cfg, tx, pulled, b, b_pad, R,
                                  state.w0, state.w0_accum, state.mlp,
                                  state.mlp_opt, lr, l2)
        pos = jnp.arange(R)
        safe_uids = jnp.where(pos < n_unique, uids,
                              state.packed.shape[0])
        packed = state.packed.at[safe_uids].set(packed_new, mode="drop")
        return StreamingNFMStatePacked(w0, w0_accum, packed, mlp,
                                       mlp_opt), loss

    return step


class StreamingNFMStatePartitioned(NamedTuple):
    """Range-PARTITIONED packed NFM master: parts[p] holds vocab rows
    [bounds[p-1], bounds[p]) as a separate [size_p, 32] array — the
    FM production path's layout (fm_kernel.StreamingFMStatePartitioned:
    scatter cost scales with the TARGET table's size, so id-range
    partitions give the zipf hot head the small-table rate), with the
    dense MLP tower riding alongside."""

    w0: jax.Array
    w0_accum: jax.Array
    parts: tuple
    mlp: list
    mlp_opt: object


def partition_streaming_state(state: StreamingNFMStatePacked,
                              bounds: tuple) -> StreamingNFMStatePartitioned:
    from .fm_kernel import split_packed_by_bounds

    return StreamingNFMStatePartitioned(
        state.w0, state.w0_accum,
        split_packed_by_bounds(state.packed, bounds), state.mlp,
        state.mlp_opt)


def departition_streaming_state(
        state: StreamingNFMStatePartitioned) -> StreamingNFMStatePacked:
    return StreamingNFMStatePacked(
        state.w0, state.w0_accum, jnp.concatenate(state.parts, axis=0),
        state.mlp, state.mlp_opt)


def make_streaming_train_step_partitioned(cfg: KernelNFMConfig,
                                          capacity: int, b_pad: int,
                                          bounds: tuple, caps: tuple):
    """Packed streaming NFM step against a range-PARTITIONED master —
    the same pull/push exchange as the FM production path
    (fm_kernel.make_partitioned_pull_push; bounds/caps/overflow contract
    and the donation caveat as documented on
    fm_kernel.make_streaming_train_step_partitioned). Returns
    step(state, b, hyper) -> ((state, loss), overflow). Trajectories are
    bit-identical to make_streaming_train_step_packed (shared
    _packed_rank_core_nfm; tests/test_nfm_kernel.py)."""
    from .fm_kernel import make_partitioned_pull_push

    R = capacity
    assert len(bounds) == len(caps) and bounds[-1] == cfg.n_features
    if cfg.fine:
        assert R % (5 * WTILE) == 0
    tx = _mlp_tx(cfg)
    pull, push = make_partitioned_pull_push(cfg.n_features, R, bounds, caps)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMStatePartitioned, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        pulled, starts, idx_ext, overflow = pull(state.parts, b)
        packed_new, w0, w0_accum, mlp, mlp_opt, loss = \
            _packed_rank_core_nfm(cfg, tx, pulled, b, b_pad, R,
                                  state.w0, state.w0_accum, state.mlp,
                                  state.mlp_opt, lr, l2)
        new_parts = push(state.parts, packed_new, starts, idx_ext)
        return (StreamingNFMStatePartitioned(w0, w0_accum, new_parts,
                                             mlp, mlp_opt), loss), overflow

    return step


def make_streaming_train_step_fused_partitioned(cfg: KernelNFMConfig,
                                                capacity: int, b_pad: int,
                                                bounds: tuple, caps: tuple):
    """ONE-dispatch streaming NFM step on RAW [B, L] batches against the
    range-PARTITIONED master: the device planner is traced into the
    partitioned step (fm_kernel.make_streaming_train_step_fused_partitioned
    composition applied to the NFM core). Returns
    step(state, ids, vals, mask, labels, row_mask, hyper) ->
    ((state, loss), overflow)."""
    from .fm_kernel import plan_batch_on_device

    assert cfg.n_features < 2**31 - 1, (
        "device planner is int32 with INT32_MAX as the pad sentinel")
    inner = make_streaming_train_step_partitioned(cfg, capacity, b_pad,
                                                  bounds, caps)
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMStatePartitioned, ids, vals, mask, labels,
             row_mask, hyper=None):
        b = plan_raw(ids, vals, mask, labels, row_mask,
                     capacity=capacity, b_pad=b_pad, n_pad_multiple=None)
        return inner_raw(state, b, hyper)

    return step


def make_streaming_train_step_fused_partitioned_binary(
        cfg: KernelNFMConfig, capacity: int, b_pad: int,
        bounds: tuple, caps: tuple):
    """make_streaming_train_step_fused_partitioned for BINARY batches:
    step(state, ids, labels) — vals/mask/row_mask synthesized as ones
    in-graph, ~1/3 the per-batch wire bytes (the FM binary wire's 2.0x
    honest-e2e win applied to NFM; see
    fm_kernel.make_streaming_train_step_fused_partitioned_binary)."""
    from .fm_kernel import plan_batch_on_device

    assert cfg.n_features < 2**31 - 1, (
        "device planner is int32 with INT32_MAX as the pad sentinel")
    inner = make_streaming_train_step_partitioned(cfg, capacity, b_pad,
                                                  bounds, caps)
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMStatePartitioned, ids, labels,
             hyper=None):
        ones = jnp.ones(ids.shape, jnp.float32)
        rmask = jnp.ones((ids.shape[0],), jnp.float32)
        b = plan_raw(ids, ones, ones, labels, rmask,
                     capacity=capacity, b_pad=b_pad, n_pad_multiple=None)
        return inner_raw(state, b, hyper)

    return step


def make_streaming_train_step_fused(cfg: KernelNFMConfig, capacity: int,
                                    b_pad: int):
    """ONE-dispatch streaming NFM step on raw [B, L] batches: the device
    batch planner (fm_kernel.plan_batch_on_device) is traced INTO the
    streaming step — transfer + plan + train per single program dispatch
    (the FM twin measured 4.19 vs 7.5 ms at B=256, PARITY.md). Numerics
    identical to plan + make_streaming_train_step
    (tests/test_nfm_kernel.py)."""
    from .fm_kernel import plan_batch_on_device

    inner = make_streaming_train_step(cfg, capacity, b_pad)
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMState, ids, vals, mask, labels, row_mask,
             hyper=None):
        b = plan_raw(ids, vals, mask, labels, row_mask,
                     capacity=capacity, b_pad=b_pad, n_pad_multiple=None)
        return inner_raw(state, b, hyper)

    return step


def export_streaming_params(state: StreamingNFMState, cfg: KernelNFMConfig):
    """-> params dict usable with models/nfm.forward (vocab space)."""
    table = np.asarray(state.table)
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(table[:, 0]),
        "v": jnp.asarray(table[:, 1 : 1 + cfg.factor]),
        "mlp": state.mlp,
    }


def export_tables(state: KernelNFMState, plan: BatchPlan, cfg: KernelNFMConfig):
    """-> params dict usable with models/nfm.forward (full-vocab space)."""
    w_full = np.zeros((cfg.n_features,), np.float32)
    v_full = np.zeros((cfg.n_features, cfg.factor), np.float32)
    rows = np.asarray(state.rows)
    uids = plan.uids[: plan.n_unique]
    w_full[uids] = rows[: plan.n_unique, 0]
    v_full[uids] = rows[: plan.n_unique, 1 : 1 + cfg.factor]
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(w_full),
        "v": jnp.asarray(v_full),
        "mlp": state.mlp,
    }
