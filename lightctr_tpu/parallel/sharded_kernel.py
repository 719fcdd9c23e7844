"""Model-axis sharding for the fused-kernel streaming trainers — the PS
capability at the vocab scale it exists for.

The reference shards its sparse KV over ParamServers by consistent
hashing and applies the optimizer server-side
(/root/reference/LightCTR/distribut/paramserver.h:122-300). TPU-native
replacement (explicit shard_map, not GSPMD inference, so the collective
pattern is pinned):

  table [V, D] row-sharded over the `model` axis (contiguous row ranges —
  the DHT analogue). Per batch, with the global unique-id list `uids`:

    pull:  each shard gathers its owned rows, zeros elsewhere ->
           one psum over `model` assembles the replicated [R, D] rank
           rows (each uid is owned by exactly one shard).
    step:  the fused Pallas kernels run replicated on every device (the
           per-batch rank-space compute is tiny next to table capacity —
           the reason to shard is MEMORY, exactly the PS's raison d'etre).
    push:  each shard applies the Adagrad update to its owned rows only —
           the server-side-update equivalent, state co-located.

Capacity scales with devices: each chip holds V/M rows, so an 8-chip
model axis holds an 8x larger vocabulary than bench.py's single-chip run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fm_kernel import (
    KernelFMConfig,
    KernelFMState,
    StreamingFMState,
    _ftrl_wide,
    count_matrices,
    kernel_backward,
    kernel_forward,
)
from ..models.nfm_kernel import KernelNFMConfig, StreamingNFMState
from ..nn.mlp import mlp_apply
from .collectives import WIRE_DTYPES, wire_psum
from ..ops import fm_fused_pallas as K


def shard_streaming_state(state: StreamingFMState, mesh: Mesh) -> StreamingFMState:
    """Place the vocab-space master tables row-sharded over `model`."""
    table_sh = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())
    return StreamingFMState(
        w0=jax.device_put(state.w0, rep),
        w0_accum=jax.device_put(state.w0_accum, rep),
        table=jax.device_put(state.table, table_sh),
        accum=jax.device_put(state.accum, table_sh),
    )


def make_sharded_streaming_step(cfg: KernelFMConfig, capacity: int,
                                b_pad: int, mesh: Mesh, wire: str = "f32"):
    """Sharded twin of fm_kernel.make_streaming_train_step: same batch
    dict (fm_kernel.plan_batch_on_device / plan_to_arrays), same losses to
    fp tolerance (tests/test_sharded_kernel.py), tables sharded.

    wire: {"f32","bf16","fp16","int8"} — precision of the rank-space
    pull psum on the wire (collectives.wire_psum; the reference PS ran
    fp16 on every pull/push, buffer.h:141-173). Scalars stay exact."""
    wd = WIRE_DTYPES[wire]
    n_k = cfg.factor
    R = capacity
    interp = cfg.interpret
    M = mesh.shape["model"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M

    def local_step(table_l, accum_l, w0, w0_accum, b, hyper):
        # hyper: [lr, l2] runtime array (one compile across sweeps)
        lr, l2 = hyper[0], hyper[1]

        uids = b["uids"]                       # [R] global ids, replicated
        n_unique = b["n_unique"]

        # ---- pull: assemble replicated rank rows from the owning shards
        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], table_l[safe], 0.0)
        rows = wire_psum(rows, "model", wd)     # [R, D] replicated
        rows = rows.at[R - 1].set(0.0)

        # ---- replicated fused-kernel compute (identical on all shards)
        rowsum, e_pos = kernel_forward(
            cfg, rows, b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
            b["tile_base"], b.get("tile_base_fine"), b_pad,
        )
        wx = rowsum[:, 0]
        s = rowsum[:, 1 : 1 + n_k]
        ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
        z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        labels_p = b["labels_padded"]
        rmask_p = b["row_mask_padded"]
        n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid

        duals = jnp.zeros((b_pad, K.S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1 : 1 + n_k].set(dlogit[:, None] * s)
        duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(
            jnp.broadcast_to(dlogit[:, None], (b_pad, n_k))
        )
        grad_rows = kernel_backward(
            cfg, b["rowid_sorted"], b["xv_sorted"], e_pos, duals,
            b["ranks_sorted"], b["tile_base"], b.get("tile_base_fine"),
            b_pad, R,
        )
        grad_rows = grad_rows + l2 * rows

        # ---- push: server-side Adagrad on owned rows only
        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = grad_rows * m
        acc_rows = jnp.where(in_range[:, None], accum_l[safe], 0.0) + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        accum_l = accum_l.at[scatter_idx].set(acc_rows, mode="drop")
        table_l = table_l.at[scatter_idx].add(-upd, mode="drop")

        g0 = jnp.sum(dlogit)
        w0_accum = w0_accum + g0 * g0
        w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table_l, accum_l, w0, w0_accum, loss

    table_spec = P("model", None)
    rep = P()
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks_sorted": rep,
        "rowid_sorted": rep, "xv_sorted": rep, "tile_base": rep,
        "tile_base_fine": rep,
        "labels_padded": rep, "row_mask_padded": rep,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, table_spec, rep, rep, batch_specs, rep),
        out_specs=(table_spec, table_spec, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMState, b: dict, hyper=None):
        h = default_hyper if hyper is None else hyper
        table, accum, w0, w0_accum, loss = mapped(
            state.table, state.accum, state.w0, state.w0_accum, b, h,
        )
        return StreamingFMState(w0, w0_accum, table, accum), loss

    return step


def shard_plan(b: dict, mesh: Mesh) -> dict:
    """Pre-place a plan dict for the 2D step: position-space arrays
    sharded over `data`, everything else replicated. Optional — the jitted
    step reshards automatically — but placing on the prefetch thread keeps
    the reshard off the step's critical path."""
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    pos_keys = ("ranks_sorted", "rowid_sorted", "xv_sorted", "tile_base",
                "tile_base_fine")
    return {
        k: jax.device_put(v, data_sh if k in pos_keys else rep)
        for k, v in b.items()
    }


def make_dp_sharded_streaming_step(cfg: KernelFMConfig, capacity: int,
                                   b_pad: int, mesh: Mesh,
                                   wire: str = "f32"):
    """2-D (data x model) twin of make_sharded_streaming_step: the vocab
    table stays row-sharded over `model` (the PS shards), and the POSITION
    space — where the fused kernels' compute lives, one one-hot MXU matmul
    per TILE window — is sharded over `data` (the Ring-AllReduce-worker
    analogue, /root/reference/LightCTR/distribut/ring_collect.h:48-72).

    The plan is global (one dedup over the whole global batch => one shared
    rank space), each data shard runs the kernels over its contiguous slice
    of the sorted position layout, and two rank-space psums glue it back:

      pull:    psum_model(owned rows)          [R, D]   (as in 1-D)
      forward: psum_data(partial rowsums)      [b_pad, S]
      push:    psum_data(partial rank grads)   [R, D], then owned-row
               Adagrad per model shard (server-side update, state
               co-located — paramserver.h:287-300)

    All collectives are batch/rank-space sized — vocab-scale traffic never
    crosses the mesh. Positions must divide evenly: build plans with
    plan_batch_on_device(..., n_pad_multiple=mesh.shape["data"] * TILE).
    Losses match the single-device streaming step to fp32 tolerance
    (tests/test_sharded_kernel.py).

    wire: precision of the three rank/batch-space psums on the wire
    (pull over `model`; rowsum + rank grads over `data`) — see
    collectives.wire_psum. Scalars stay exact."""
    from ..ops.embedding_pallas import TILE

    wd = WIRE_DTYPES[wire]
    n_k = cfg.factor
    R = capacity
    interp = cfg.interpret
    M = mesh.shape["model"]
    Dd = mesh.shape["data"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M

    def local_step(table_l, accum_l, w0, w0_accum, b, hyper):
        lr, l2 = hyper[0], hyper[1]
        uids = b["uids"]                        # [R] global ids, replicated
        n_unique = b["n_unique"]

        # ---- pull: assemble replicated rank rows from the owning shards
        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], table_l[safe], 0.0)
        rows = wire_psum(rows, "model", wd)     # [R, D] replicated
        rows = rows.at[R - 1].set(0.0)

        # ---- forward over this shard's position slice; psum the partial
        # per-row sums (each position contributes to exactly one row)
        rowsum, e_pos = kernel_forward(
            cfg, rows, b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
            b["tile_base"], b.get("tile_base_fine"), b_pad,
        )
        rowsum = wire_psum(rowsum, "data", wd)  # [b_pad, S] replicated
        wx = rowsum[:, 0]
        s = rowsum[:, 1 : 1 + n_k]
        ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
        z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        labels_p = b["labels_padded"]
        rmask_p = b["row_mask_padded"]
        n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid

        duals = jnp.zeros((b_pad, K.S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1 : 1 + n_k].set(dlogit[:, None] * s)
        duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(
            jnp.broadcast_to(dlogit[:, None], (b_pad, n_k))
        )
        grad_rows = kernel_backward(
            cfg, b["rowid_sorted"], b["xv_sorted"], e_pos, duals,
            b["ranks_sorted"], b["tile_base"], b.get("tile_base_fine"),
            b_pad, R,
        )
        grad_rows = wire_psum(grad_rows, "data", wd)  # [R, D] replicated
        grad_rows = grad_rows + l2 * rows

        # ---- push: server-side Adagrad on owned rows only
        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = grad_rows * m
        acc_rows = jnp.where(in_range[:, None], accum_l[safe], 0.0) + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        accum_l = accum_l.at[scatter_idx].set(acc_rows, mode="drop")
        table_l = table_l.at[scatter_idx].add(-upd, mode="drop")

        g0 = jnp.sum(dlogit)
        w0_accum = w0_accum + g0 * g0
        w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table_l, accum_l, w0, w0_accum, loss

    table_spec = P("model", None)
    rep = P()
    pos_spec = P("data")
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks_sorted": pos_spec,
        "rowid_sorted": pos_spec, "xv_sorted": pos_spec,
        "tile_base": pos_spec, "tile_base_fine": pos_spec,
        "labels_padded": rep, "row_mask_padded": rep,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, table_spec, rep, rep, batch_specs, rep),
        out_specs=(table_spec, table_spec, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMState, b: dict, hyper=None):
        n = b["ranks_sorted"].shape[0]
        assert n % (Dd * TILE) == 0, (
            f"{n} positions not divisible by data axis {Dd} x TILE {TILE}; "
            f"plan with n_pad_multiple={Dd * TILE}"
        )
        h = default_hyper if hyper is None else hyper
        table, accum, w0, w0_accum, loss = mapped(
            state.table, state.accum, state.w0, state.w0_accum, b, h,
        )
        return StreamingFMState(w0, w0_accum, table, accum), loss

    return step


def shard_streaming_nfm_state(state: StreamingNFMState,
                              mesh: Mesh) -> StreamingNFMState:
    """Vocab tables row-sharded over `model`; the MLP tower + Adam state
    replicate (they are KB-scale next to the table)."""
    table_sh = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())
    return StreamingNFMState(
        w0=jax.device_put(state.w0, rep),
        w0_accum=jax.device_put(state.w0_accum, rep),
        table=jax.device_put(state.table, table_sh),
        accum=jax.device_put(state.accum, table_sh),
        mlp=jax.device_put(state.mlp, rep),
        mlp_opt=jax.device_put(state.mlp_opt, rep),
    )


def make_sharded_streaming_nfm_step(cfg: KernelNFMConfig, capacity: int,
                                    b_pad: int, mesh: Mesh,
                                    wire: str = "f32"):
    """Sharded twin of nfm_kernel.make_streaming_train_step: the same
    pull -> fused kernels -> row-sparse push cycle as the FM step, plus
    the XLA MLP tower on the pooled [B, K] tensor. The tower runs
    replicated on every shard (deterministic, so the Adam update keeps
    the replicas bit-identical — no psum needed); only the vocab table
    shards. Capability: the reference's NFM under its PS deployment
    (train_nfm_algo.cpp:78-160 + paramserver.h:122-300).
    wire: pull-psum precision (collectives.wire_psum)."""
    from .. import optim

    wd = WIRE_DTYPES[wire]

    n_k = cfg.factor
    R = capacity
    interp = cfg.interpret
    M = mesh.shape["model"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M
    from ..models.nfm_kernel import _mlp_tx as _nfm_tx

    tx = _nfm_tx(cfg)   # honors cfg.mlp_optimizer (adam/adagrad)

    def local_step(table_l, accum_l, w0, w0_accum, mlp, mlp_opt, b, hyper):
        lr, l2 = hyper[0], hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]

        # ---- pull (same owned-rows psum as the FM step)
        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], table_l[safe], 0.0)
        rows = wire_psum(rows, "model", wd)
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

        # ---- push: server-side Adagrad on owned rows only
        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = grad_rows * m
        acc_rows = jnp.where(in_range[:, None], accum_l[safe], 0.0) + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        accum_l = accum_l.at[scatter_idx].set(acc_rows, mode="drop")
        table_l = table_l.at[scatter_idx].add(-upd, mode="drop")

        # ---- replicated MLP Adam (identical inputs on every shard)
        mlp_updates, mlp_opt = tx.update(d_mlp, mlp_opt, mlp)
        mlp = optim.apply_updates(mlp, mlp_updates)

        g0 = jnp.sum(dlogit)
        w0_accum = w0_accum + g0 * g0
        w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table_l, accum_l, w0, w0_accum, mlp, mlp_opt, loss

    table_spec = P("model", None)
    rep = P()
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks_sorted": rep,
        "rowid_sorted": rep, "xv_sorted": rep, "tile_base": rep,
        "tile_base_fine": rep,
        "labels_padded": rep, "row_mask_padded": rep,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, table_spec, rep, rep, rep, rep,
                  batch_specs, rep),
        out_specs=(table_spec, table_spec, rep, rep, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMState, b: dict, hyper=None):
        h = default_hyper if hyper is None else hyper
        table, accum, w0, w0_accum, mlp, mlp_opt, loss = mapped(
            state.table, state.accum, state.w0, state.w0_accum,
            state.mlp, state.mlp_opt, b, h,
        )
        return StreamingNFMState(w0, w0_accum, table, accum, mlp,
                                 mlp_opt), loss

    return step


def shard_streaming_ffm_state(state, mesh: Mesh):
    """Vocab-space FFM master tables row-sharded over `model`. The FFM
    table is (1 + F*K)-wide per row — the heaviest of the kernel family,
    so the per-chip memory win from sharding is the largest here."""
    from ..models.ffm_kernel import StreamingFFMState

    table_sh = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())
    return StreamingFFMState(
        w0=jax.device_put(state.w0, rep),
        w0_accum=jax.device_put(state.w0_accum, rep),
        table=jax.device_put(state.table, table_sh),
        accum=jax.device_put(state.accum, table_sh),
    )


def make_sharded_streaming_ffm_step(cfg, capacity: int, mesh: Mesh,
                                    fields_partition: bool = False,
                                    wire: str = "f32"):
    """Sharded twin of ffm_kernel.make_streaming_train_step: the same
    owned-rows pull/psum -> replicated field-aggregation kernels (autodiff
    supplies the backward through the Pallas rank_lookup) -> owned-row
    server-side Adagrad push. Batch dict from ffm_kernel.plan_to_arrays.
    fields_partition: see ffm_kernel.make_streaming_train_step (rank-field
    self-term for datasets whose feature ids partition into fields).
    Capability: the reference FFM under its PS cluster
    (train_ffm_algo.cpp:51-116 + paramserver.h:122-300).
    wire: pull-psum precision (collectives.wire_psum)."""
    from ..models.ffm_kernel import (
        StreamingFFMState,
        _logits_from_counts,
        _logits_from_counts_rf,
        _logits_from_rank_rows,
        count_matrix,
        count_matrix_rows,
    )

    wd = WIRE_DTYPES[wire]
    R = capacity
    M = mesh.shape["model"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M

    def local_step(table_l, accum_l, w0, w0_accum, b, hyper):
        lr, l2 = hyper[0], hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]

        # ---- pull: owned rows -> psum assembles replicated [R, Dw]
        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], table_l[safe], 0.0)
        rows = wire_psum(rows, "model", wd)
        rows = rows.at[R - 1].set(0.0)

        n_valid = jnp.maximum(jnp.sum(b["row_mask"]), 1.0)
        if cfg.agg:
            # count-matrix engine (the full-batch product path's math,
            # per-batch C built in-graph — B is minibatch-sized here)
            cdt = jnp.float32 if cfg.exact else jnp.bfloat16
            C = count_matrix(b["ranks"], b["fields"], b["xv"], R,
                             cfg.n_fields, cdt)
            if fields_partition:
                # in-graph rank->field map; see the single-device
                # streaming step for why padding/unused slots are inert
                Bb, Lb = b["xv"].shape
                rf = (jnp.zeros((R,), jnp.int32)
                      .at[b["ranks"][: Bb * Lb]]
                      .set(b["fields"].reshape(-1)))
                Crow2 = count_matrix_rows(b["ranks"], b["xv"] * b["xv"],
                                          R, cdt)

                def loss_fn(rows, w0):
                    z = _logits_from_counts_rf(rows, w0, C, Crow2, rf, cfg)
                    per = (jnp.maximum(z, 0) - z * b["labels"]
                           + jnp.log1p(jnp.exp(-jnp.abs(z))))
                    return jnp.sum(per * b["row_mask"]) / n_valid
            else:
                def loss_fn(rows, w0):
                    z = _logits_from_counts(rows, w0, C, b["ranks"],
                                            b["fields"], b["xv"], cfg)
                    per = (jnp.maximum(z, 0) - z * b["labels"]
                           + jnp.log1p(jnp.exp(-jnp.abs(z))))
                    return jnp.sum(per * b["row_mask"]) / n_valid
        else:
            onehot_f = jax.nn.one_hot(b["fields"], cfg.n_fields)
            weighted = onehot_f * b["xv"][..., None]

            def loss_fn(rows, w0):
                z = _logits_from_rank_rows(rows, w0, b["ranks"], b["xv"],
                                           cfg, onehot_f, weighted)
                per = (jnp.maximum(z, 0) - z * b["labels"]
                       + jnp.log1p(jnp.exp(-jnp.abs(z))))
                return jnp.sum(per * b["row_mask"]) / n_valid

        loss, (g_rows, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, w0
        )
        g_rows = g_rows + l2 * rows

        # ---- push: server-side Adagrad on owned rows only
        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = g_rows * m
        acc_rows = jnp.where(in_range[:, None], accum_l[safe], 0.0) + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        accum_l = accum_l.at[scatter_idx].set(acc_rows, mode="drop")
        table_l = table_l.at[scatter_idx].add(-upd, mode="drop")

        w0_accum = w0_accum + g_w0 * g_w0
        w0 = w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table_l, accum_l, w0, w0_accum, loss

    table_spec = P("model", None)
    rep = P()
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks": rep, "xv": rep,
        "fields": rep, "labels": rep, "row_mask": rep,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, table_spec, rep, rep, batch_specs, rep),
        out_specs=(table_spec, table_spec, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, b: dict, hyper=None):
        h = default_hyper if hyper is None else hyper
        table, accum, w0, w0_accum, loss = mapped(
            state.table, state.accum, state.w0, state.w0_accum, b, h,
        )
        from ..models.ffm_kernel import StreamingFFMState

        return StreamingFFMState(w0, w0_accum, table, accum), loss

    return step




def make_dp_sharded_streaming_nfm_step(cfg: KernelNFMConfig, capacity: int,
                                       b_pad: int, mesh: Mesh,
                                       wire: str = "f32"):
    """2-D (data x model) twin of make_sharded_streaming_nfm_step —
    the same position-space sharding as make_dp_sharded_streaming_step
    (the Ring-AllReduce-worker analogue) on top of the model-sharded
    vocab table (the PS shards), plus the replicated MLP tower: the
    pooled [b_pad, K] tensor is identical on every shard after the
    rowsum psum, so the tower forward/backward/Adam run in lockstep
    with no extra collective. Collectives: pull psum over `model`,
    rowsum + rank-grad psums over `data` — all batch/rank-space sized.
    Plans from plan_batch_on_device(..., n_pad_multiple=data*TILE).
    Reference capability: NFM under a PS cluster with data-parallel
    workers (train_nfm_algo.cpp:78-160 +
    /root/reference/LightCTR/distributed_algo_abst.h:176-280)."""
    from .. import optim
    from ..ops.embedding_pallas import TILE

    wd = WIRE_DTYPES[wire]
    n_k = cfg.factor
    R = capacity
    M = mesh.shape["model"]
    Dd = mesh.shape["data"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M
    from ..models.nfm_kernel import _mlp_tx as _nfm_tx

    tx = _nfm_tx(cfg)   # honors cfg.mlp_optimizer (adam/adagrad)

    def local_step(table_l, accum_l, w0, w0_accum, mlp, mlp_opt, b, hyper):
        lr, l2 = hyper[0], hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]

        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], table_l[safe], 0.0)
        rows = wire_psum(rows, "model", wd)
        rows = rows.at[R - 1].set(0.0)

        rowsum, e_pos = kernel_forward(
            cfg, rows, b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
            b["tile_base"], b.get("tile_base_fine"), b_pad,
        )
        rowsum = wire_psum(rowsum, "data", wd)   # [b_pad, S] replicated
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
        grad_rows = wire_psum(grad_rows, "data", wd)  # [R, D] replicated
        grad_rows = grad_rows + l2 * rows

        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = grad_rows * m
        acc_rows = jnp.where(in_range[:, None], accum_l[safe], 0.0) + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        accum_l = accum_l.at[scatter_idx].set(acc_rows, mode="drop")
        table_l = table_l.at[scatter_idx].add(-upd, mode="drop")

        mlp_updates, mlp_opt = tx.update(d_mlp, mlp_opt, mlp)
        mlp = optim.apply_updates(mlp, mlp_updates)

        g0 = jnp.sum(dlogit)
        w0_accum = w0_accum + g0 * g0
        w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table_l, accum_l, w0, w0_accum, mlp, mlp_opt, loss

    table_spec = P("model", None)
    rep = P()
    pos_spec = P("data")
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks_sorted": pos_spec,
        "rowid_sorted": pos_spec, "xv_sorted": pos_spec,
        "tile_base": pos_spec, "tile_base_fine": pos_spec,
        "labels_padded": rep, "row_mask_padded": rep,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, table_spec, rep, rep, rep, rep,
                  batch_specs, rep),
        out_specs=(table_spec, table_spec, rep, rep, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingNFMState, b: dict, hyper=None):
        n = b["ranks_sorted"].shape[0]
        assert n % (Dd * TILE) == 0, (
            f"{n} positions not divisible by data axis {Dd} x TILE {TILE}; "
            f"plan with n_pad_multiple={Dd * TILE}"
        )
        h = default_hyper if hyper is None else hyper
        table, accum, w0, w0_accum, mlp, mlp_opt, loss = mapped(
            state.table, state.accum, state.w0, state.w0_accum,
            state.mlp, state.mlp_opt, b, h,
        )
        return StreamingNFMState(w0, w0_accum, table, accum, mlp,
                                 mlp_opt), loss

    return step


def make_dp_sharded_streaming_ffm_step(cfg, capacity: int, mesh: Mesh,
                                       fields_partition: bool = False,
                                       wire: str = "f32"):
    """2-D (data x model) twin of make_sharded_streaming_ffm_step: the
    (1 + F*K)-wide FFM master — the HEAVIEST table of the kernel family
    — shards over `model` (the PS shards) while the BATCH rows shard
    over `data` (the data-parallel-worker analogue): each shard builds
    its count matrices over its B/D batch rows against the shared
    global rank space and ONE rank-space grad psum over `data` glues
    the slices; the pull psum over `model` assembles the rank rows as
    in 1-D. All collectives are batch/rank-space sized — vocab-scale
    traffic never crosses the mesh. Batch dicts from
    ffm_kernel.plan_to_arrays with B divisible by the data axis.
    Reference capability: FFM under the PS cluster with data-parallel
    workers (/root/reference/LightCTR/distributed_algo_abst.h:176-280,
    paramserver.h:122-300)."""
    from ..models.ffm_kernel import (
        StreamingFFMState,
        _logits_from_counts,
        _logits_from_counts_rf,
        _logits_from_rank_rows,
        count_matrix,
        count_matrix_rows,
    )

    wd = WIRE_DTYPES[wire]
    R = capacity
    M = mesh.shape["model"]
    Dd = mesh.shape["data"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M

    def local_step(table_l, accum_l, w0, w0_accum, b, hyper):
        lr, l2 = hyper[0], hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]

        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], table_l[safe], 0.0)
        rows = wire_psum(rows, "model", wd)
        rows = rows.at[R - 1].set(0.0)

        # global n_valid: the loss normaliser spans the whole batch
        n_valid = jnp.maximum(
            jax.lax.psum(jnp.sum(b["row_mask"]), "data"), 1.0)
        if cfg.agg:
            cdt = jnp.float32 if cfg.exact else jnp.bfloat16
            C = count_matrix(b["ranks"], b["fields"], b["xv"], R,
                             cfg.n_fields, cdt)
            if fields_partition:
                # local rank->field map: entries for ranks absent from
                # this shard's rows are wrong-but-inert (their count-
                # matrix columns are zero here — same argument as the
                # single-device padding note)
                Bb, Lb = b["xv"].shape
                rf = (jnp.zeros((R,), jnp.int32)
                      .at[b["ranks"][: Bb * Lb]]
                      .set(b["fields"].reshape(-1)))
                Crow2 = count_matrix_rows(b["ranks"], b["xv"] * b["xv"],
                                          R, cdt)

                def loss_fn(rows, w0):
                    z = _logits_from_counts_rf(rows, w0, C, Crow2, rf, cfg)
                    per = (jnp.maximum(z, 0) - z * b["labels"]
                           + jnp.log1p(jnp.exp(-jnp.abs(z))))
                    return jnp.sum(per * b["row_mask"]) / n_valid
            else:
                def loss_fn(rows, w0):
                    z = _logits_from_counts(rows, w0, C, b["ranks"],
                                            b["fields"], b["xv"], cfg)
                    per = (jnp.maximum(z, 0) - z * b["labels"]
                           + jnp.log1p(jnp.exp(-jnp.abs(z))))
                    return jnp.sum(per * b["row_mask"]) / n_valid
        else:
            onehot_f = jax.nn.one_hot(b["fields"], cfg.n_fields)
            weighted = onehot_f * b["xv"][..., None]

            def loss_fn(rows, w0):
                z = _logits_from_rank_rows(rows, w0, b["ranks"], b["xv"],
                                           cfg, onehot_f, weighted)
                per = (jnp.maximum(z, 0) - z * b["labels"]
                       + jnp.log1p(jnp.exp(-jnp.abs(z))))
                return jnp.sum(per * b["row_mask"]) / n_valid

        loss, (g_rows, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, w0
        )
        loss = jax.lax.psum(loss, "data")
        g_rows = wire_psum(g_rows, "data", wd)
        g_w0 = jax.lax.psum(g_w0, "data")
        g_rows = g_rows + l2 * rows

        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = g_rows * m
        acc_rows = jnp.where(in_range[:, None], accum_l[safe], 0.0) + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        accum_l = accum_l.at[scatter_idx].set(acc_rows, mode="drop")
        table_l = table_l.at[scatter_idx].add(-upd, mode="drop")

        w0_accum = w0_accum + g_w0 * g_w0
        w0 = w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table_l, accum_l, w0, w0_accum, loss

    table_spec = P("model", None)
    rep = P()
    row_spec = P("data")
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks": P("data"),
        "xv": P("data", None), "fields": P("data", None),
        "labels": row_spec, "row_mask": row_spec,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, table_spec, rep, rep, batch_specs, rep),
        out_specs=(table_spec, table_spec, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, b: dict, hyper=None):
        B, L = b["xv"].shape
        assert B % Dd == 0, f"batch {B} not divisible by data axis {Dd}"
        # ranks rides flat [n_pad >= B*L]; trim to B*L so each data
        # shard's position slice lines up with its batch-row slice
        b = dict(b, ranks=b["ranks"][: B * L])
        h = default_hyper if hyper is None else hyper
        table, accum, w0, w0_accum, loss = mapped(
            state.table, state.accum, state.w0, state.w0_accum, b, h,
        )
        from ..models.ffm_kernel import StreamingFFMState

        return StreamingFFMState(w0, w0_accum, table, accum), loss

    return step


def make_xmat_sharded_train_step(cfg: KernelFMConfig, plan, mesh: Mesh,
                                 wire: str = "f32"):
    """Data-sharded twin of the full-batch design-matrix (xmat) FM step —
    the headline 0.14 ms step scaled over the `data` mesh axis (the
    reference's Ring-AllReduce regime, ring_collect.h:48-72, on its
    full-batch trainer train_fm_algo.cpp:38).

    The plan-constant count matrices Crow/Crow2 [b_pad, R] are row-sharded
    over `data` (each shard owns a contiguous slice of the batch); the
    rank-space state [R, D] replicates (R is per-batch-small — that is
    what makes xmat viable at all). Per step each shard runs the dense
    [b_local, R] x [R, D] matmuls on its slice and ONE rank-space psum of
    (loss, grad_rows, g0) makes the Adagrad update bit-identical on every
    shard. Losses equal the single-device xmat step to fp32 tolerance
    (tests/test_sharded_kernel.py).

    Returns a step carrying `_stepfn`/`_consts` so fm_kernel.make_multi_step
    threads the sharded count matrices through the jit boundary as runtime
    arguments (not HLO literals). wire: grad-psum precision
    (collectives.wire_psum; loss/g0 scalars stay exact)."""
    wd = WIRE_DTYPES[wire]
    n_k = cfg.factor
    R = plan.n_rows_pad
    b_pad = plan.b_pad
    B = plan.labels.shape[0]
    Dd = mesh.shape["data"]
    assert b_pad % Dd == 0, (b_pad, Dd)
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows

    Crow32, Crow2_32 = count_matrices(plan)
    data_sh = NamedSharding(mesh, P("data", None))
    vec_sh = NamedSharding(mesh, P("data"))
    consts = (
        jax.device_put(Crow32.astype(cdt), data_sh),
        jax.device_put(Crow2_32.astype(cdt), data_sh),
        jax.device_put(jnp.asarray(labels_p), vec_sh),
        jax.device_put(jnp.asarray(rmask_p), vec_sh),
    )

    def local_step(rows, w0, w0_accum, accum, ftrl_z, ftrl_n,
                   Crow, Crow2, lab, rm, hyper):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        def loss_fn(rows, w0):
            V = rows[:, 1 : 1 + n_k]
            s_aug = jnp.einsum("br,rk->bk", Crow,
                               rows[:, : 1 + n_k].astype(cdt),
                               preferred_element_type=jnp.float32)
            wx, s = s_aug[:, 0], s_aug[:, 1:]
            ss = jnp.einsum("br,rk->bk", Crow2, (V * V).astype(cdt),
                            preferred_element_type=jnp.float32)
            z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
            per = jnp.maximum(z, 0) - z * lab + jnp.log1p(jnp.exp(-jnp.abs(z)))
            return jnp.sum(per * rm) / n_valid     # local slice's share

        loss, (grad_rows, g0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, w0
        )
        # ONE rank-space psum glues the batch slices back together
        # (grads at wire precision; the scalars are negligible bytes)
        grad_rows = wire_psum(grad_rows, "data", wd)
        loss, g0 = jax.lax.psum((loss, g0), "data")

        grad_rows = grad_rows + l2 * rows
        accum = accum + grad_rows * grad_rows
        new_rows = rows - lr * grad_rows / (jnp.sqrt(accum) + 1e-7)
        if cfg.wide_optimizer == "ftrl":
            state_like = KernelFMState(w0, w0_accum, rows, accum,
                                       ftrl_z, ftrl_n)
            new_rows, ftrl_z, ftrl_n = _ftrl_wide(cfg, state_like, new_rows,
                                                  grad_rows)
        new_rows = new_rows.at[R - 1].set(0.0)
        w0_accum = w0_accum + g0 * g0
        w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return new_rows, w0, w0_accum, accum, ftrl_z, ftrl_n, loss

    rep = P()
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep,
                  P("data", None), P("data", None), P("data"), P("data"),
                  rep),
        out_specs=(rep, rep, rep, rep, rep, rep, rep),
        check_rep=False,
    )

    def raw_step(state: KernelFMState, hyper, consts):
        Crow, Crow2, lab, rm = consts
        rows, w0, w0_accum, accum, ftrl_z, ftrl_n, loss = mapped(
            state.rows, state.w0, state.w0_accum, state.accum,
            state.ftrl_z, state.ftrl_n, Crow, Crow2, lab, rm, hyper,
        )
        return KernelFMState(w0, w0_accum, rows, accum, ftrl_z, ftrl_n), loss

    jitted = jax.jit(raw_step)

    def step(state: KernelFMState, hyper=None):
        return jitted(state, hyper, consts)

    step._stepfn = raw_step
    step._consts = consts
    return step


def make_grouped_sharded_ffm_step(cfg, gplan, mesh: Mesh,
                                  wire: str = "f32"):
    """Data-sharded twin of the grouped field-blocked FFM step
    (models/ffm_kernel.make_train_step_grouped) — the FFM headline
    full-batch trainer scaled over the `data` mesh axis, same regime as
    make_xmat_sharded_train_step: the per-group count matrices
    [B, F_g, r_g] are batch-row-sharded, the grouped table replicates
    (it is per-batch-small by construction), and ONE psum of
    (loss, g_table, g_w0) makes the Adagrad update bit-identical on
    every shard. Reference capability: full-batch FFM training
    (train_ffm_algo.cpp:51-116) under the Ring-AllReduce regime
    (ring_collect.h:48-72). wire: grad-psum precision
    (collectives.wire_psum)."""
    from ..models.ffm_kernel import (
        KernelFFMState,
        _logits_from_counts_grouped,
        count_matrices_grouped,
    )

    wd = WIRE_DTYPES[wire]
    B = gplan.labels.shape[0]
    Dd = mesh.shape["data"]
    assert B % Dd == 0, (B, Dd)
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    n_valid = gplan.n_valid_rows

    batch_sh = NamedSharding(mesh, P("data", None, None))
    vec_sh = NamedSharding(mesh, P("data"))
    # build the count matrices ALREADY SHARDED: the [B, L] plan arrays
    # are placed batch-row-sharded and the scatter runs under GSPMD with
    # sharded outputs — the full [B, rows_total] working set never has
    # to fit one device (it is why the data axis exists)
    pos_sh = NamedSharding(mesh, P("data", None))
    xv = jax.device_put(gplan.xv, pos_sh)
    nf = jax.device_put(gplan.new_field, pos_sh)
    sl = jax.device_put(gplan.slots, pos_sh)
    grp_sh = tuple(batch_sh for _ in gplan.f_start)

    def _build(xv, nf, sl):
        import dataclasses as _dc

        p = _dc.replace(gplan, xv=xv, new_field=nf, slots=sl)
        return (count_matrices_grouped(p, xv, cdt),
                count_matrices_grouped(p, xv * xv, cdt))

    Cs, Crow2s = jax.jit(_build, out_shardings=(grp_sh, grp_sh))(xv, nf, sl)
    consts = (
        Cs,
        Crow2s,
        jax.device_put(gplan.labels, vec_sh),
        jax.device_put(gplan.row_mask, vec_sh),
    )

    def local_step(table, w0, w0_accum, accum, Cs, Crow2s, lab, rm, hyper):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        def loss_fn(table, w0):
            z = _logits_from_counts_grouped(table, w0, Cs, Crow2s, cfg,
                                            gplan)
            per = (jnp.maximum(z, 0) - z * lab
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
            return jnp.sum(per * rm) / n_valid     # local slice's share

        loss, (g_table, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            table, w0
        )
        g_table = wire_psum(g_table, "data", wd)
        loss, g_w0 = jax.lax.psum((loss, g_w0), "data")
        g_table = g_table + l2 * table
        accum = accum + g_table * g_table
        table = table - lr * g_table / (jnp.sqrt(accum) + 1e-7)
        w0_accum = w0_accum + g_w0 * g_w0
        w0 = w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return table, w0, w0_accum, accum, loss

    rep = P()
    grp = tuple(P("data", None, None) for _ in gplan.f_start)
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, grp, grp, P("data"), P("data"), rep),
        out_specs=(rep, rep, rep, rep, rep),
        check_rep=False,
    )

    def raw_step(state, hyper, consts):
        Cs, Crow2s, lab, rm = consts
        table, w0, w0_accum, accum, loss = mapped(
            state.table, state.w0, state.w0_accum, state.accum,
            Cs, Crow2s, lab, rm, hyper,
        )
        return KernelFFMState(w0, w0_accum, table, accum), loss

    jitted = jax.jit(raw_step)

    def step(state, hyper=None):
        return jitted(state, hyper, consts)

    step._stepfn = raw_step
    step._consts = consts
    return step


# ---------------------------------------------------------------------------
# Sharded streaming Wide&Deep (r5): the reference's PS-mode flagship
# (distributed_algo_abst.h:106-117) as a shard_map twin of
# widedeep_kernel.make_streaming_train_step_packed — the packed [V, 32]
# master row-sharded over `model` (owned-rows pull/psum + server-side
# Adagrad push), the dense tower replicated in deterministic lockstep
# like the NFM twin.


def shard_streaming_wd_state(state, mesh: Mesh):
    """widedeep_kernel.StreamingWDStatePacked with the packed master
    row-sharded over `model`; tower + scalars replicated."""
    from ..models.widedeep_kernel import StreamingWDStatePacked

    table_sh = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())
    return StreamingWDStatePacked(
        w0=jax.device_put(state.w0, rep),
        w0_accum=jax.device_put(state.w0_accum, rep),
        packed=jax.device_put(state.packed, table_sh),
        mlp=jax.device_put(state.mlp, rep),
        mlp_opt=jax.device_put(state.mlp_opt, rep),
    )


def make_sharded_streaming_wd_step(cfg, capacity: int, mesh: Mesh,
                                   wire: str = "f32"):
    """Sharded twin of widedeep_kernel.make_streaming_train_step_packed:
    owned-rows pull + wire_psum assembles the replicated [R, 16] rank
    rows, the flat-agg core (S = C @ [w|v] + tower) runs replicated,
    and each shard applies the server-side Adagrad to its own rows of
    the packed master. Batch dict from ffm_kernel.plan_batch_on_device
    (it carries fields). cfg: widedeep_kernel.KernelWDConfig."""
    from .. import optim
    from ..models.widedeep_kernel import (
        StreamingWDStatePacked,
        _wd_loss_and_grads,
    )

    wd = WIRE_DTYPES[wire]
    R = capacity
    D = K.D
    M = mesh.shape["model"]
    V = cfg.n_features
    assert V % M == 0, (
        f"vocab {V} not divisible by model axis {M}; round with "
        f"parallel.sharding.round_up_vocab(n, {M})"
    )
    rows_per_shard = V // M
    from ..models.widedeep_kernel import _mlp_tx as _wd_tx

    tx = _wd_tx(cfg)    # honors cfg.mlp_optimizer (adam/adagrad)

    def local_step(packed_l, w0, w0_accum, mlp, mlp_opt, b, hyper):
        lr, l2 = hyper[0], hyper[1]
        uids = b["uids"]
        n_unique = b["n_unique"]

        shard = jax.lax.axis_index("model")
        offset = shard * rows_per_shard
        local = uids - offset
        in_range = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = jnp.where(in_range[:, None], packed_l[safe, :D], 0.0)
        rows = wire_psum(rows, "model", wd)
        rows = rows.at[R - 1].set(0.0)

        # loss math shared VERBATIM with the single-device cores
        # (widedeep_kernel._wd_loss_and_grads) — the trajectory-equality
        # contract can't drift
        loss, g_rows, g0, d_mlp = _wd_loss_and_grads(cfg, rows, b, R,
                                                     w0, mlp, l2)

        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = g_rows * m
        acc_rows = jnp.where(in_range[:, None],
                             packed_l[safe, D:], 0.0) + g * g
        rows_new = rows - lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        own = in_range & (pos < n_unique)
        scatter_idx = jnp.where(own, safe, rows_per_shard)
        packed_l = packed_l.at[scatter_idx].set(
            jnp.concatenate([rows_new, acc_rows], axis=1), mode="drop")

        mlp_updates, mlp_opt = tx.update(d_mlp, mlp_opt, mlp)
        mlp = optim.apply_updates(mlp, mlp_updates)

        w0_accum = w0_accum + g0 * g0
        w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return packed_l, w0, w0_accum, mlp, mlp_opt, loss

    table_spec = P("model", None)
    rep = P()
    batch_specs = {
        "uids": rep, "n_unique": rep, "ranks": rep, "xv": rep,
        "fields": rep, "labels": rep, "row_mask": rep,
    }
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(table_spec, rep, rep, rep, rep, batch_specs, rep),
        out_specs=(table_spec, rep, rep, rep, rep, rep),
        check_rep=False,
    )

    default_hyper = jnp.asarray([cfg.learning_rate, cfg.l2], jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, b: dict, hyper=None):
        h = default_hyper if hyper is None else hyper
        packed, w0, w0_accum, mlp, mlp_opt, loss = mapped(
            state.packed, state.w0, state.w0_accum, state.mlp,
            state.mlp_opt, b, h,
        )
        return StreamingWDStatePacked(w0, w0_accum, packed, mlp,
                                      mlp_opt), loss

    return step
