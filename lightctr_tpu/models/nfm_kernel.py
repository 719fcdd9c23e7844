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
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..nn.mlp import mlp_apply, mlp_init
from ..ops import fm_fused_pallas as K
from ..ops.embedding_pallas import blocked_scatter_add
from .fm_kernel import BatchPlan, plan_batch  # shared plan machinery


@dataclasses.dataclass(frozen=True)
class KernelNFMConfig:
    n_features: int
    factor: int = 8
    hidden: tuple = (32,)
    activation: str = "relu"
    learning_rate: float = 0.05
    mlp_learning_rate: float = 1e-3
    init_std: float = 0.01
    l2: float = 0.0
    interpret: bool = False
    exact: bool = True


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
    tx = optim.adam(cfg.mlp_learning_rate)
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
    interp = cfg.interpret
    B = plan.labels.shape[0]
    tx = optim.adam(cfg.mlp_learning_rate)

    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows

    @jax.jit
    def step(state: KernelNFMState, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        rowsum, e_pos = K.fm_forward(
            state.rows, plan.ranks_sorted, plan.rowid_sorted, plan.xv_sorted,
            plan.tile_base, n_k=n_k, b_pad=b_pad, interpret=interp,
            exact=cfg.exact,
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

        dwv_pos = K.fm_backward_positions(
            plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
            n_k=n_k, b_pad=b_pad, interpret=interp, exact=cfg.exact,
        )
        grad_rows = blocked_scatter_add(
            dwv_pos, plan.ranks_sorted, plan.tile_base,
            n_rows=R, interpret=interp, exact=cfg.exact,
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
