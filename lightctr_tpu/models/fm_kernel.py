"""FM trainer on the fused Pallas kernels (ops/fm_fused_pallas.py).

Trains in *unique-rank space*: the per-batch plan (sorted COO + dedup,
ops/embedding_pallas.plan_sorted_layout) maps touched feature ids to dense
ranks once, and every training step runs entirely on [R, D] arrays — the
master table in the full vocabulary is only materialised on export. This
is the TPU-native endpoint of the reference's PS pull/compute/push design
(the pull set IS the unique-rank space; server-side Adagrad becomes a
dense tiny update on [R, D]).

For full-batch training (the reference's FM regime, train_fm_algo.cpp:38)
the plan is computed once and the sort cost is zero per step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import fm_fused_pallas as K
from ..ops.embedding_pallas import (
    TILE,
    WTILE,
    blocked_scatter_add,
    blocked_scatter_add_fine,
    plan_sorted_layout,
)
from ..ops.run_ops import plan_runs, run_broadcast, run_scatter_add


@dataclasses.dataclass(frozen=True)
class KernelFMConfig:
    n_features: int
    factor: int = 8
    learning_rate: float = 0.05
    init_std: float = 0.01
    l2: float = 0.0
    # wide (w column) optimizer: "adagrad" or "ftrl" (FTRL-proximal with
    # the reference's constants, gradientUpdater.h:240-243 — the classic
    # sparse-LR wide part, now inside the fused kernel step)
    wide_optimizer: str = "adagrad"
    ftrl_alpha: float = 0.15
    ftrl_beta: float = 1.0
    ftrl_lambda1: float = 1.0
    ftrl_lambda2: float = 1.0
    interpret: bool = False
    # exact=True runs the one-hot matmuls in fp32 (slower, fp32-faithful);
    # False uses bf16 (fastest; quality fine for few-epoch production
    # regimes, drifts on long small-data runs)
    exact: bool = True
    # runops=True computes the rank-direction gather/scatter as XLA
    # cumsum-over-runs (ops/run_ops.py) instead of one-hot kernels.
    # Measured SLOWER on v5e (7.7ms vs 3.7ms/step: TPU cumsum along a
    # 384k axis costs ~19 log-passes) — kept as an alternative for
    # hardware/shapes where scans are cheap. Default off.
    runops: bool = False
    # fused=True runs the whole hot path (fwd + loss/duals + bwd +
    # scatter) as ONE two-phase pallas_call (ops/fm_fused_pallas.py
    # fm_fused_step) — no e_pos/duals/dwv HBM round-trips, one dispatch.
    fused: bool = False
    # fine=True uses 5x128-row gather/scatter windows instead of 2x512
    # (ops/embedding_pallas.blocked_*_fine): ~37% fewer one-hot MACs,
    # measured +3% step time on v5e with exact-identical losses
    # (benchmarks/bench_fine_windows.py). Needs a plan built with
    # plan_batch(..., fine=True) (n_rows_pad % (fine_nwin*128) == 0).
    fine: bool = False
    # fine window geometry: fine_tile positions per grid slot with an
    # fine_nwin x 128-row rank window. The production fine core is
    # Mosaic GRID-SLOT-overhead-bound (~5.8 us/slot, PARITY.md), so
    # fine_tile=1024/fine_nwin=10 HALVES the slot count per sweep (the
    # window must cover a tile's rank span: dense ranks advance <= 1
    # per position, so nwin >= tile/128 + 1). Needs a plan built with
    # the same fine_tile/fine_nwin and positions % fine_tile == 0.
    fine_tile: int = 512
    fine_nwin: int = 5
    # row_width: packed row layout is [w | v(factor) | pad]. The Pallas
    # kernel family is compiled at D=16 (factor <= 15, ops/fm_fused_pallas
    # K.D); wider factors (the reference's vs_libfm goes to k=64) run on
    # the width-agnostic design-matrix (xmat) path and pad the row to the
    # next multiple of 16 lanes.
    # MFU note (measured, benchmarks/bench_k64_bf16.py): the xmat
    # matmuls' MXU occupancy tracks 128-LANE tiles of (1 + factor) —
    # k=64 (D=129, two tiles, half empty) runs 12.7% MFU while k=127
    # (D=128, one full tile) runs 26.5% AND is faster in absolute time.
    # When model quality allows, pick factor = 128*m - 1.
    @property
    def row_width(self) -> int:
        return max(16, (1 + self.factor + 15) // 16 * 16)

    # xmat=True (full-batch make_train_step only): the design-matrix
    # formulation. FM's forward AND backward only ever consume per-row
    # aggregates (s = sum x*V, ss = sum x^2*V^2, and their transposes) —
    # never per-position values — so the whole step factors through two
    # plan-constant count matrices Crow[b, r] = sum(x), Crow2[b, r] =
    # sum(x^2) built once by scalar scatter-add. Every gather/scatter/
    # row-reduce becomes a dense [b_pad, R] @ [R, D] matmul (~36 MB Crow
    # at the bench workload vs the position-space kernels' [n, window]
    # one-hot builds). Position arrays never enter the step.
    xmat: bool = False


class KernelFMState(NamedTuple):
    w0: jax.Array
    w0_accum: jax.Array
    rows: jax.Array    # [R, 16] packed [w | v | pad] in unique-rank space
    accum: jax.Array   # [R, 16] adagrad accumulator
    ftrl_z: jax.Array  # [R, 1] FTRL z state (wide column; zeros if unused)
    ftrl_n: jax.Array  # [R, 1] FTRL n state


@dataclasses.dataclass
class BatchPlan:
    """Device-side plan + batch tensors in sorted-position order."""

    ranks_sorted: jax.Array
    rowid_sorted: jax.Array
    xv_sorted: jax.Array
    tile_base: jax.Array
    start_pos: jax.Array   # [R] run starts (ops/run_ops.py)
    last_pos: jax.Array    # [R] run ends
    labels: jax.Array
    row_mask: jax.Array
    uids: np.ndarray
    n_unique: int
    n_rows_pad: int
    b_pad: int
    n_valid_rows: float
    tile_base_fine: jax.Array | None = None  # WTILE-unit bases (fine=True)


def plan_batch(ids, vals, mask, labels, row_mask=None, n_rows_pad=None,
               trim=None, fine=False, fine_tile: int = TILE,
               fine_nwin: int = 5) -> BatchPlan:
    """Host-side batch planning. ids/vals/mask: [B, L] numpy.

    trim: drop the masked tail of the sorted position arrays (see
    plan_sorted_layout) — on for one-shot/full-batch plans (27% less
    kernel work on the bundled data), OFF when n_rows_pad is given
    (streaming plans must keep batch-independent static shapes).

    fine: also emit WTILE-unit window bases (tile_base_fine) and size the
    rank space for the fine_nwin x 128-window kernels (cfg.fine=True);
    fine_tile/fine_nwin must match the consuming config
    (KernelFMConfig.fine_tile docstring has the coverage rule)."""
    B, L = ids.shape
    if trim is None:
        trim = n_rows_pad is None
    if row_mask is None:
        row_mask = np.ones((B,), np.float32)
    assert fine_nwin * WTILE >= fine_tile + WTILE, (
        f"window {fine_nwin}x{WTILE} cannot cover a {fine_tile}-position "
        f"tile's rank span")
    xv = (vals * mask).astype(np.float32)
    plan = plan_sorted_layout(
        ids, mask, n_rows_pad, trim=trim,
        n_rows_multiple=fine_nwin * WTILE if fine else None)
    perm = plan["perm"]
    rowid_sorted = (perm // L).astype(np.int32)
    # batch padding: lane-aligned
    b_pad = max(((B + 127) // 128) * 128, 128)
    start_pos, last_pos = plan_runs(plan["ranks_sorted"], plan["n_rows_pad"])
    tbf = None
    if fine:
        R = plan["n_rows_pad"]
        assert R % (fine_nwin * WTILE) == 0, (
            f"fine plan needs R % {fine_nwin * WTILE} == 0, got {R}")
        n_pos = plan["ranks_sorted"].shape[0]
        assert n_pos % fine_tile == 0, (
            f"fine_tile={fine_tile} needs positions % {fine_tile} == 0, "
            f"got {n_pos}")
        tbf = jnp.asarray(np.minimum(
            plan["ranks_sorted"][::fine_tile] // WTILE,
            R // WTILE - fine_nwin
        ).astype(np.int32))
    return BatchPlan(
        ranks_sorted=jnp.asarray(plan["ranks_sorted"]),
        rowid_sorted=jnp.asarray(rowid_sorted),
        xv_sorted=jnp.asarray(xv.reshape(-1)[perm]),
        tile_base=jnp.asarray(plan["tile_base"]),
        start_pos=jnp.asarray(start_pos),
        last_pos=jnp.asarray(last_pos),
        labels=jnp.asarray(labels.astype(np.float32)),
        row_mask=jnp.asarray(row_mask.astype(np.float32)),
        uids=plan["uids"],
        n_unique=plan["n_unique"],
        n_rows_pad=plan["n_rows_pad"],
        b_pad=b_pad,
        n_valid_rows=float(row_mask.sum()),
        tile_base_fine=tbf,
    )


def init(rng: jax.Array, cfg: KernelFMConfig, plan: BatchPlan) -> KernelFMState:
    R = plan.n_rows_pad
    rows = jnp.zeros((R, cfg.row_width))
    v = jax.random.normal(rng, (R, cfg.factor)) * cfg.init_std
    rows = rows.at[:, 1 : 1 + cfg.factor].set(v)
    # padding rank row stays zero
    rows = rows.at[R - 1].set(0.0)
    return KernelFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        rows=rows,
        accum=jnp.zeros((R, cfg.row_width)),
        ftrl_z=jnp.zeros((R, 1)),
        ftrl_n=jnp.zeros((R, 1)),
    )


def kernel_forward(cfg, rows, ranks_sorted, rowid_sorted, xv_sorted,
                   tile_base, tile_base_fine, b_pad: int):
    """Dispatch the fused forward to the coarse (2x512-row window) or fine
    (5x128-row window) one-hot kernels by cfg.fine. Shared by the FM and
    NFM full-batch + streaming steps (cfg needs .factor/.interpret/.exact/
    .fine). Returns (rowsum [b_pad, S], e_pos [n, D])."""
    if cfg.fine:
        return K.fm_forward_fine(
            rows, ranks_sorted, rowid_sorted, xv_sorted, tile_base_fine,
            n_k=cfg.factor, b_pad=b_pad, n_win=getattr(cfg, "fine_nwin", 5),
            tile=getattr(cfg, "fine_tile", TILE), interpret=cfg.interpret,
            exact=cfg.exact,
        )
    return K.fm_forward(
        rows, ranks_sorted, rowid_sorted, xv_sorted, tile_base,
        n_k=cfg.factor, b_pad=b_pad, interpret=cfg.interpret, exact=cfg.exact,
    )


def kernel_backward(cfg, rowid_sorted, xv_sorted, e_pos, duals, ranks_sorted,
                    tile_base, tile_base_fine, b_pad: int, n_rows: int):
    """Dispatch duals -> grad_rows [n_rows, D]. Fine mode runs the merged
    backward+scatter kernel (dwv never hits HBM — measured 2.65 -> 2.13 ms
    on the bench workload); coarse runs backward-positions + scatter-add."""
    if cfg.fine:
        return K.fm_backward_scatter_fine(
            rowid_sorted, xv_sorted, e_pos, duals, ranks_sorted,
            tile_base_fine, n_k=cfg.factor, b_pad=b_pad, n_rows=n_rows,
            n_win=getattr(cfg, "fine_nwin", 5),
            tile=getattr(cfg, "fine_tile", TILE),
            interpret=cfg.interpret, exact=cfg.exact,
        )
    dwv_pos = K.fm_backward_positions(
        rowid_sorted, xv_sorted, e_pos, duals, n_k=cfg.factor, b_pad=b_pad,
        interpret=cfg.interpret, exact=cfg.exact,
    )
    return blocked_scatter_add(
        dwv_pos, ranks_sorted, tile_base, n_rows=n_rows,
        interpret=cfg.interpret, exact=cfg.exact,
    )


def count_matrices(plan: BatchPlan, dtype=jnp.float32):
    """Design matrices in rank space: Crow[b, r] = sum of x over row b's
    positions mapping to rank r, Crow2[b, r] = sum of x^2. Built once per
    plan by ONE scalar scatter-add each (any position order works).
    Padding positions carry xv=0 so they contribute nothing."""
    R = plan.n_rows_pad
    rid = plan.rowid_sorted
    rnk = plan.ranks_sorted
    xv = plan.xv_sorted.astype(dtype)
    Crow = jnp.zeros((plan.b_pad, R), dtype).at[rid, rnk].add(
        xv, mode="drop")
    Crow2 = jnp.zeros((plan.b_pad, R), dtype).at[rid, rnk].add(
        xv * xv, mode="drop")
    return Crow, Crow2


def _ftrl_wide(cfg: KernelFMConfig, state: KernelFMState, rows, grad_rows):
    """FTRL-proximal on the wide (w) column — reference FTRLUpdater
    semantics (gradientUpdater.h:235-278). Returns (rows, ftrl_z, ftrl_n)."""
    g_w = grad_rows[:, 0:1]
    w_old = state.rows[:, 0:1]
    n_new = state.ftrl_n + g_w * g_w
    sigma = (jnp.sqrt(n_new) - jnp.sqrt(state.ftrl_n)) / cfg.ftrl_alpha
    z_new = state.ftrl_z + g_w - sigma * w_old
    w_new = jnp.where(
        jnp.abs(z_new) <= cfg.ftrl_lambda1,
        0.0,
        -(z_new - jnp.sign(z_new) * cfg.ftrl_lambda1)
        / ((cfg.ftrl_beta + jnp.sqrt(n_new)) / cfg.ftrl_alpha
           + cfg.ftrl_lambda2),
    )
    return rows.at[:, 0:1].set(w_new), z_new, n_new


def _make_xmat_train_step(cfg: KernelFMConfig, plan: BatchPlan,
                          labels_p, rmask_p, n_valid):
    """Design-matrix full-batch FM step (cfg.xmat): the rank space is
    small enough to densify the batch's sparse structure, so gather,
    row-reduce AND scatter all become dense [b_pad, R] x [R, D] matmuls
    against the plan-constant Crow/Crow2 — the position axis disappears
    from the step entirely. Numerically identical to the kernel path
    (tests/test_fm_xmat.py); reference math train_fm_algo.cpp:63-118."""
    n_k = cfg.factor
    R = plan.n_rows_pad
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    Crow32, Crow2_32 = count_matrices(plan)
    Crow = Crow32.astype(cdt)
    Crow2 = Crow2_32.astype(cdt)

    def loss_fn(rows, w0):
        # one augmented matmul serves wx AND s: column 0 of the packed row
        # layout is w, columns 1..k are V, so Crow @ rows[:, :1+k] reads
        # Crow from HBM once for both (the step is Crow-bandwidth-bound)
        V = rows[:, 1 : 1 + n_k]
        s_aug = jnp.einsum("br,rk->bk", Crow,
                           rows[:, : 1 + n_k].astype(cdt),
                           preferred_element_type=jnp.float32)
        wx, s = s_aug[:, 0], s_aug[:, 1:]
        ss = jnp.einsum("br,rk->bk", Crow2, (V * V).astype(cdt),
                        preferred_element_type=jnp.float32)
        z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return jnp.sum(per * rmask_p) / n_valid

    @jax.jit
    def step(state: KernelFMState, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        loss, (grad_rows, g0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.rows, state.w0
        )
        grad_rows = grad_rows + l2 * state.rows
        # Adagrad elementwise in a PACKED [R*D/128, 128] view: the
        # [R, 16] layout uses 16/128 VPU lanes; packed recovers the
        # entire optimizer residual (0.1276 -> 0.1192 ms == the
        # no-accum SGD bound; benchmarks/bench_xmat_opt.py). Free
        # reshapes of a row-major buffer; same math bit-for-bit.
        shp = state.rows.shape
        g_p = grad_rows.reshape(-1, 128)
        acc_p = state.accum.reshape(-1, 128) + g_p * g_p
        rows = (state.rows.reshape(-1, 128)
                - lr * g_p / (jnp.sqrt(acc_p) + 1e-7)).reshape(shp)
        accum = acc_p.reshape(shp)
        if cfg.wide_optimizer == "ftrl":
            rows, ftrl_z, ftrl_n = _ftrl_wide(cfg, state, rows, grad_rows)
        else:
            ftrl_z, ftrl_n = state.ftrl_z, state.ftrl_n
        rows = rows.at[R - 1].set(0.0)
        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return KernelFMState(w0, w0_accum, rows, accum, ftrl_z, ftrl_n), loss

    return step


def _xmat_rank_grads(cfg: KernelFMConfig, rows, w0, b, b_pad: int, R: int):
    """Per-batch count-matrix forward/backward for the STREAMING steps
    (cfg.xmat): Crow/Crow2 are built on device from the sorted plan arrays
    by one scalar scatter-add each (padding positions carry xv=0 and
    out-of-range rowids drop), then loss and gradients flow through dense
    [b_pad, R] x [R, D] matmuls via autodiff — same math as the full-batch
    xmat step, with the matrices as runtime data instead of plan
    constants. Memory: 2 * b_pad * R * 4 bytes — the engine gates this on
    capacity (production-scale R densifies to GBs; use the fine-window
    kernels there). Returns (loss, grad_rows [R, D], g_w0)."""
    n_k = cfg.factor
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    rid, rnk = b["rowid_sorted"], b["ranks_sorted"]
    xv = b["xv_sorted"]
    Crow = (jnp.zeros((b_pad, R)).at[rid, rnk].add(xv, mode="drop")
            .astype(cdt))
    Crow2 = (jnp.zeros((b_pad, R)).at[rid, rnk].add(xv * xv, mode="drop")
             .astype(cdt))
    labels_p = b["labels_padded"]
    rmask_p = b["row_mask_padded"]
    n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)

    def loss_fn(rows, w0):
        V = rows[:, 1 : 1 + n_k]
        s_aug = jnp.einsum("br,rk->bk", Crow,
                           rows[:, : 1 + n_k].astype(cdt),
                           preferred_element_type=jnp.float32)
        wx, s = s_aug[:, 0], s_aug[:, 1:]
        ss = jnp.einsum("br,rk->bk", Crow2, (V * V).astype(cdt),
                        preferred_element_type=jnp.float32)
        z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        per = (jnp.maximum(z, 0) - z * labels_p
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * rmask_p) / n_valid

    loss, (grad_rows, g0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        rows, w0
    )
    return loss, grad_rows, g0


@functools.partial(
    jax.jit, static_argnames=("capacity", "b_pad")
)
def plan_super_batch_on_device(ids, vals, mask, labels, row_mask,
                               capacity: int, b_pad: int) -> dict:
    """Batch planning for the K-step SUPER-BATCH streaming step: one
    global dedup over K minibatches' ids (the union rank space the
    master is pulled/pushed against ONCE), plus each sub-batch's sorted
    position layout and touched-row mask within that union space.

    ids/vals/mask: [K, B, L]; labels/row_mask: [K, B]. capacity covers
    the UNION's unique count (+TILE+1, multiple of 2*TILE).
    Returns dict of stacked per-batch arrays for
    make_streaming_super_step_fused."""
    from ..ops.embedding_pallas import TILE

    K_, B, L = ids.shape
    n = B * L
    n_pad = (n + TILE - 1) // TILE * TILE
    flat = ids.reshape(-1).astype(jnp.int32)            # [K*B*L]
    valid = mask.reshape(-1) > 0
    sentinel = jnp.int32(2**31 - 1)
    keyed = jnp.where(valid, flat, sentinel)
    order = jnp.argsort(keyed)
    sorted_ids = keyed[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    is_new = jnp.where(sorted_ids == sentinel, 0, is_new)
    ranks_g = jnp.cumsum(is_new) - 1
    n_unique = jnp.sum(is_new)

    pad_rank = capacity - 1
    ranks_sorted_g = jnp.where(sorted_ids == sentinel, pad_rank,
                               ranks_g).astype(jnp.int32)
    take = jnp.where(is_new > 0, ranks_g, capacity)
    uids = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[take].set(jnp.where(sorted_ids == sentinel, 0, sorted_ids),
                      mode="drop")[:capacity]
    )
    # back to natural [K, B*L] order, then sort WITHIN each sub-batch
    ranks_nat = (jnp.zeros((K_ * n,), jnp.int32)
                 .at[order].set(ranks_sorted_g)).reshape(K_, n)
    xv = (vals * mask).reshape(K_, n)
    if n_pad > n:
        ranks_nat = jnp.concatenate(
            [ranks_nat, jnp.full((K_, n_pad - n), pad_rank, jnp.int32)],
            axis=1)
        xv = jnp.concatenate([xv, jnp.zeros((K_, n_pad - n))], axis=1)
    border = jax.vmap(jnp.argsort)(ranks_nat)           # [K, n_pad]
    ranks_sorted = jnp.take_along_axis(ranks_nat, border, axis=1)
    xv_sorted = jnp.take_along_axis(xv, border, axis=1)
    rowid_sorted = (border // L).astype(jnp.int32)      # pad pos -> >= B
    tile_base = jnp.minimum(
        ranks_sorted[:, ::TILE] // TILE, capacity // TILE - 2
    ).astype(jnp.int32)

    # touched-row mask per sub-batch (for the per-step L2 term)
    bidx = jnp.repeat(jnp.arange(K_, dtype=jnp.int32)[:, None], n, axis=1)
    touched = (
        jnp.zeros((K_, capacity + 1), jnp.float32)
        .at[bidx.reshape(-1),
            jnp.where(valid, ranks_nat[:, :n].reshape(-1), capacity)]
        .set(1.0, mode="drop")[:, :capacity]
    )
    touched = touched.at[:, capacity - 1].set(0.0)

    labels_p = jnp.zeros((K_, b_pad)).at[:, :B].set(labels)
    rmask_p = jnp.zeros((K_, b_pad)).at[:, :B].set(row_mask)
    return {
        "uids": uids,
        "n_unique": n_unique.astype(jnp.int32),
        "ranks_sorted": ranks_sorted,
        "rowid_sorted": rowid_sorted,
        "xv_sorted": xv_sorted,
        "tile_base": tile_base,
        "touched": touched,
        "labels_padded": labels_p,
        "row_mask_padded": rmask_p,
    }


def make_streaming_super_step_fused(cfg: KernelFMConfig, capacity: int,
                                    b_pad: int, k_steps: int):
    """K-STEP super-batch streaming step: pull the UNION of K
    minibatches' rows from the vocab master ONCE, lax.scan K exact
    sub-steps in rank space (each sub-step's gradients are zero outside
    its own touched rows, and its L2 term is masked to them, so the
    trajectory is IDENTICAL to K sequential fused steps —
    tests/test_fm_super.py), push once. The master exchange is per-ROW
    bound (PARITY.md row-exchange verdict), so overlapping id sets
    amortise: zipf-1.2 production batches overlap such that union(8) is
    0.63x the sequential row-ops.

    Takes ids/vals/mask [K, B, L], labels/row_mask [K, B]; coarse
    (fine=False, xmat=False) kernel path."""
    assert not cfg.fine and not cfg.xmat, "super-step: coarse kernels"
    assert cfg.n_features < 2**31 - 1
    n_k = cfg.factor
    R = capacity
    D = K.D

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMStatePacked, ids, vals, mask, labels,
             row_mask, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        b = plan_super_batch_on_device.__wrapped__(
            ids, vals, mask, labels, row_mask, capacity=capacity,
            b_pad=b_pad)
        uids = b["uids"]
        n_unique = b["n_unique"]
        pulled = state.packed[uids]              # ONE union gather
        rows0 = pulled[:, :D].at[R - 1].set(0.0)
        acc0 = pulled[:, D:]

        def body(carry, xs):
            rows, acc, w0, w0_accum = carry
            ranks_s, rowid_s, xv_s, tbase, touched, labels_p, rmask_p = xs
            rowsum, e_pos = kernel_forward(
                cfg, rows, ranks_s, rowid_s, xv_s, tbase, None, b_pad)
            wx = rowsum[:, 0]
            sv = rowsum[:, 1 : 1 + n_k]
            ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
            z = w0 + wx + 0.5 * jnp.sum(sv * sv - ss, axis=-1)
            n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
            per = (jnp.maximum(z, 0) - z * labels_p
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
            loss = jnp.sum(per * rmask_p) / n_valid
            dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid

            duals = jnp.zeros((b_pad, K.S))
            duals = duals.at[:, 0].set(dlogit)
            duals = duals.at[:, 1 : 1 + n_k].set(dlogit[:, None] * sv)
            duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(
                jnp.broadcast_to(dlogit[:, None], (b_pad, n_k)))
            grad_rows = kernel_backward(
                cfg, rowid_s, xv_s, e_pos, duals, ranks_s, tbase, None,
                b_pad, R)
            # L2 masked to THIS batch's touched rows — the sequential
            # baseline only regularises rows it pulls
            g = grad_rows + l2 * rows * touched[:, None]
            acc = acc + g * g
            rows = rows - lr * g / (jnp.sqrt(acc) + 1e-7)
            rows = rows.at[R - 1].set(0.0)

            g0 = jnp.sum(dlogit)
            w0_accum = w0_accum + g0 * g0
            w0 = w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
            return (rows, acc, w0, w0_accum), loss

        xs = (b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
              b["tile_base"], b["touched"], b["labels_padded"],
              b["row_mask_padded"])
        (rows, acc, w0, w0_accum), losses = jax.lax.scan(
            body, (rows0, acc0, state.w0, state.w0_accum), xs)

        pos = jnp.arange(R)
        safe_uids = jnp.where(pos < n_unique, uids, state.packed.shape[0])
        packed = state.packed.at[safe_uids].set(
            jnp.concatenate([rows, acc], axis=1), mode="drop"
        )                                        # ONE union scatter
        return StreamingFMStatePacked(w0, w0_accum, packed), losses

    return step


def make_streaming_epoch_scan(fused_step):
    """Fold a FUSED streaming step over a STACK of minibatches in ONE
    dispatched lax.scan: run(state, *stacked[S, ...]) ->
    (state, losses[S]). The small-dataset streaming regime (e.g. the
    reference NFM's 20 batches/epoch over 1000 rows) otherwise pays
    ~0.4 ms tunnel dispatch + fixed step overhead PER BATCH — measured
    11 ms/step vs this scan's one dispatch per epoch
    (benchmarks/bench_nfm_headtohead.py provenance). Works for any
    fused one-dispatch step in this family (fm/nfm/ffm): they are pure
    (state, *batch_arrays, hyper) -> (state, loss) maps."""
    raw = fused_step.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, *stacked, hyper=None):
        def body(s, xs):
            s2, loss = raw(s, *xs, hyper)
            return s2, loss

        return jax.lax.scan(body, state, stacked)

    return run


def make_streaming_run(fused_step, n_rows_pad: int, batch_size: int,
                       epochs: int):
    """The WHOLE minibatch-streaming run as ONE compiled program:
    dataset arrays live on device once, each epoch draws a fresh
    device-side permutation (jax.random.permutation in-graph), an inner
    lax.scan streams the fused one-dispatch step over the batches, an
    outer scan runs the epochs — one dispatch and one readback for the
    entire run. Per-epoch dispatch over the tunneled backend measured
    ~140 ms/epoch even with the batches pre-stacked (the host->device
    transfer of the reshuffled stack dominates); this is the
    gmm.fit_scan shape applied to the streaming trainers.

    run(state, arrays, rng) -> (state, epoch_mean_losses[epochs]);
    arrays: per-row tensors ([N, L] ids/vals/mask[/fields] + [N] labels,
    row_mask) with N == n_rows_pad (pad rows carry row_mask 0)."""
    raw = fused_step.__wrapped__
    n_batches = n_rows_pad // batch_size
    assert n_batches * batch_size == n_rows_pad

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, arrays, rng):
        def epoch_body(s, erng):
            perm = jax.random.permutation(erng, n_rows_pad)

            def batch_body(s, i):
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, i * batch_size, batch_size)
                xs = tuple(a[idx] for a in arrays)
                s2, loss = raw(s, *xs, None)
                return s2, loss

            s, losses = jax.lax.scan(batch_body, s,
                                     jnp.arange(n_batches))
            return s, jnp.mean(losses)

        rngs = jax.random.split(rng, epochs)
        return jax.lax.scan(epoch_body, state, rngs)

    return run


def make_multi_step(step, n_steps: int):
    """Fold n_steps train-step calls into ONE dispatched lax.scan program:
    `run(state, hyper=None) -> (state, losses[n_steps])`. Works for any of
    the full-batch step functions in this family (fm/nfm/ffm, kernel or
    xmat) — they are pure (state, hyper) -> (state, loss) maps.

    Two reasons this is the product path for full-batch training (the
    reference's regime is 1000 full-batch epochs, train_fm_algo.cpp:38):
    per-step dispatch over a tunneled backend costs ~0.3-0.5 ms — more
    than the xmat step itself — and one scan returns every epoch's loss
    in a single readback.

    Steps that carry large plan-constant tensors (the count-matrix FFM
    engine) expose them via `_stepfn`/`_consts` attributes; those are
    threaded through the jit boundary as RUNTIME arguments — neither
    HLO-literal constants (remote-compile size limit) nor rebuilt inside
    the scan (XLA does not hoist the build; measured 23.2 -> 12.93 ms,
    benchmarks/bench_ffm_agg_profile.py)."""
    stepfn = getattr(step, "_stepfn", None)
    if stepfn is not None:
        consts = step._consts

        @jax.jit
        def run_c(state, hyper, consts):
            def body(s, _):
                s2, loss = stepfn(s, hyper, consts)
                return s2, loss
            return jax.lax.scan(body, state, None, length=n_steps)

        return lambda state, hyper=None: run_c(state, hyper, consts)

    @jax.jit
    def run(state, hyper=None):
        def body(s, _):
            s2, loss = step(s, hyper)
            return s2, loss
        return jax.lax.scan(body, state, None, length=n_steps)

    return run


def make_train_step(cfg: KernelFMConfig, plan: BatchPlan):
    n_k = cfg.factor
    b_pad = plan.b_pad
    R = plan.n_rows_pad
    interp = cfg.interpret
    B = plan.labels.shape[0]

    if cfg.fine and plan.tile_base_fine is None:
        raise ValueError("cfg.fine=True needs plan_batch(..., fine=True)")

    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows

    n = plan.ranks_sorted.shape[0]

    if cfg.xmat:
        return _make_xmat_train_step(cfg, plan, labels_p, rmask_p, n_valid)
    if cfg.factor + 1 > K.D:
        raise ValueError(
            f"factor={cfg.factor} exceeds the Pallas kernel row width "
            f"(K.D={K.D}); use cfg.xmat=True for wide factors")

    @jax.jit
    def step(state: KernelFMState, hyper=None):
        # hyper: optional [lr, l2] runtime override (keeps one compile
        # across hyperparameter sweeps — compiles are expensive on
        # tunneled backends)
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        if cfg.fused:
            stats, grad_rows = K.fm_fused_step(
                state.rows, plan.ranks_sorted, plan.rowid_sorted,
                plan.xv_sorted, plan.tile_base,
                labels_p, rmask_p / n_valid, state.w0,
                n_k=n_k, b_pad=b_pad, n_rows=R,
                interpret=interp, exact=cfg.exact,
            )
            loss = jnp.sum(stats[:, K.S - 1])
            dlogit = stats[:, 0]
            grad_rows = grad_rows + l2 * state.rows
            accum = state.accum + grad_rows * grad_rows
            rows = state.rows - lr * grad_rows / (jnp.sqrt(accum) + 1e-7)
            if cfg.wide_optimizer == "ftrl":
                g_w = grad_rows[:, 0:1]
                w_old = state.rows[:, 0:1]
                n_new = state.ftrl_n + g_w * g_w
                sigma = (jnp.sqrt(n_new) - jnp.sqrt(state.ftrl_n)) / cfg.ftrl_alpha
                z_new = state.ftrl_z + g_w - sigma * w_old
                w_new = jnp.where(
                    jnp.abs(z_new) <= cfg.ftrl_lambda1,
                    0.0,
                    -(z_new - jnp.sign(z_new) * cfg.ftrl_lambda1)
                    / ((cfg.ftrl_beta + jnp.sqrt(n_new)) / cfg.ftrl_alpha
                       + cfg.ftrl_lambda2),
                )
                rows = rows.at[:, 0:1].set(w_new)
                ftrl_z, ftrl_n = z_new, n_new
            else:
                ftrl_z, ftrl_n = state.ftrl_z, state.ftrl_n
            rows = rows.at[R - 1].set(0.0)
            g0 = jnp.sum(dlogit)
            w0_accum = state.w0_accum + g0 * g0
            w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
            return KernelFMState(w0, w0_accum, rows, accum,
                                 ftrl_z, ftrl_n), loss
        if cfg.runops:
            e_pos = run_broadcast(
                state.rows, plan.start_pos, jnp.zeros((n, K.D))
            )
            xv = plan.xv_sorted[:, None]
            w_col = e_pos[:, 0:1]
            v_cols = e_pos[:, 1 : 1 + n_k]
            vx = v_cols * xv
            terms = jnp.concatenate(
                [w_col * xv, vx, vx * vx,
                 jnp.zeros((n, K.S - 1 - 2 * n_k))], axis=1
            )
            rowsum = K.row_reduce(
                plan.rowid_sorted, terms, b_pad=b_pad, interpret=interp,
                exact=cfg.exact,
            )
        elif cfg.fine:
            rowsum, e_pos = K.fm_forward_fine(
                state.rows, plan.ranks_sorted, plan.rowid_sorted,
                plan.xv_sorted, plan.tile_base_fine, n_k=n_k, b_pad=b_pad,
                n_win=5, interpret=interp, exact=cfg.exact,
            )
        else:
            rowsum, e_pos = K.fm_forward(
                state.rows, plan.ranks_sorted, plan.rowid_sorted,
                plan.xv_sorted, plan.tile_base, n_k=n_k, b_pad=b_pad,
                interpret=interp, exact=cfg.exact,
            )
        wx = rowsum[:, 0]
        s = rowsum[:, 1 : 1 + n_k]
        ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
        logits = state.w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)  # [b_pad]
        z = logits
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid    # [b_pad]

        # generalised dual packing: a = dlogit*s, b = dlogit (FM case)
        duals = jnp.zeros((b_pad, K.S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1 : 1 + n_k].set(dlogit[:, None] * s)
        duals = duals.at[:, 1 + n_k : 1 + 2 * n_k].set(
            jnp.broadcast_to(dlogit[:, None], (b_pad, n_k))
        )

        if cfg.fine and not cfg.runops:
            # merged backward+scatter: one grid pass, dwv never hits HBM
            grad_rows = K.fm_backward_scatter_fine(
                plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
                plan.ranks_sorted, plan.tile_base_fine, n_k=n_k,
                b_pad=b_pad, n_rows=R, n_win=5, interpret=interp,
                exact=cfg.exact,
            )
        else:
            dwv_pos = K.fm_backward_positions(
                plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
                n_k=n_k, b_pad=b_pad, interpret=interp, exact=cfg.exact,
            )
            if cfg.runops:
                grad_rows = run_scatter_add(dwv_pos, plan.last_pos)
            else:
                grad_rows = blocked_scatter_add(
                    dwv_pos, plan.ranks_sorted, plan.tile_base,
                    n_rows=R, interpret=interp, exact=cfg.exact,
                )
        grad_rows = grad_rows + l2 * state.rows

        accum = state.accum + grad_rows * grad_rows
        rows = state.rows - lr * grad_rows / (jnp.sqrt(accum) + 1e-7)

        if cfg.wide_optimizer == "ftrl":
            # FTRL-proximal on the wide column (reference FTRLUpdater
            # semantics, gradientUpdater.h:235-278)
            g_w = grad_rows[:, 0:1]
            w_old = state.rows[:, 0:1]
            n_new = state.ftrl_n + g_w * g_w
            sigma = (jnp.sqrt(n_new) - jnp.sqrt(state.ftrl_n)) / cfg.ftrl_alpha
            z_new = state.ftrl_z + g_w - sigma * w_old
            w_new = jnp.where(
                jnp.abs(z_new) <= cfg.ftrl_lambda1,
                0.0,
                -(z_new - jnp.sign(z_new) * cfg.ftrl_lambda1)
                / ((cfg.ftrl_beta + jnp.sqrt(n_new)) / cfg.ftrl_alpha
                   + cfg.ftrl_lambda2),
            )
            rows = rows.at[:, 0:1].set(w_new)
            ftrl_z, ftrl_n = z_new, n_new
        else:
            ftrl_z, ftrl_n = state.ftrl_z, state.ftrl_n

        rows = rows.at[R - 1].set(0.0)  # keep the padding rank row zero

        g0 = jnp.sum(dlogit)
        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return KernelFMState(w0, w0_accum, rows, accum, ftrl_z, ftrl_n), loss

    return step


class StreamingFMState(NamedTuple):
    """Master tables in VOCAB space (ranks are per-batch labels only)."""

    w0: jax.Array
    w0_accum: jax.Array
    table: jax.Array   # [V, 16] packed [w | v | pad]
    accum: jax.Array   # [V, 16] adagrad accumulator


def streaming_init(rng: jax.Array, cfg: KernelFMConfig) -> StreamingFMState:
    table = jnp.zeros((cfg.n_features, K.D))
    table = table.at[:, 1 : 1 + cfg.factor].set(
        jax.random.normal(rng, (cfg.n_features, cfg.factor)) * cfg.init_std
    )
    return StreamingFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        table=table,
        accum=jnp.zeros((cfg.n_features, K.D)),
    )


def make_streaming_train_step(cfg: KernelFMConfig, capacity: int, b_pad: int):
    """Minibatch-streaming kernel step: ONE compiled program serves every
    batch. Master tables live in vocab space; each batch's plan (computed
    host-side, e.g. on the data/pipeline.Prefetcher thread — mirroring the
    reference worker's per-batch pull-key set,
    distributed_algo_abst.h:181-190) supplies the unique-id list and the
    sorted layout as runtime arrays:

      gather uids rows ("pull") -> fused kernels in batch-rank space ->
      row-sparse Adagrad scatter ("push" + server-side update).

    capacity: static unique-rank space size (multiple of 2*TILE, >= max
    unique ids per batch + TILE).
    """
    n_k = cfg.factor
    R = capacity
    if cfg.fine:
        assert R % (cfg.fine_nwin * WTILE) == 0, (
            f"cfg.fine streaming needs capacity % "
            f"{cfg.fine_nwin * WTILE} == 0, got {R}"
        )

    # donate_argnums: the vocab-space master tables update in place —
    # without donation every step copies the full [V, 16] table + accum
    # (1.3 GB of HBM traffic at 10M vocab before any math runs).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMState, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        uids = b["uids"]                        # [R] int32, padded with 0
        n_unique = b["n_unique"]                # scalar int32
        rows = state.table[uids]                # "pull" unique rows
        rows = rows.at[R - 1].set(0.0)          # pad rank row reads zero

        if cfg.xmat:
            loss, grad_rows, g0 = _xmat_rank_grads(
                cfg, rows, state.w0, b, b_pad, R)
        else:
            rowsum, e_pos = kernel_forward(
                cfg, rows, b["ranks_sorted"], b["rowid_sorted"],
                b["xv_sorted"], b["tile_base"], b.get("tile_base_fine"),
                b_pad,
            )
            wx = rowsum[:, 0]
            s = rowsum[:, 1 : 1 + n_k]
            ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
            z = state.w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
            labels_p = b["labels_padded"]
            rmask_p = b["row_mask_padded"]
            n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
            per = (jnp.maximum(z, 0) - z * labels_p
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
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
            g0 = jnp.sum(dlogit)
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

        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return StreamingFMState(w0, w0_accum, table, accum), loss

    return step


class StreamingFMStatePacked(NamedTuple):
    """Streaming state with table+accum interleaved as ONE [V, 32] array.

    Measured (benchmarks/bench_gather_cost.py, v5e, 10M rows x 260k
    touched): XLA gather/scatter against vocab-scale tables is per-ROW
    bound, not per-element — one [R, 32] gather + one [R, 32] scatter-set
    costs far less than the unpacked layout's 2 gathers + 2 scatters
    (scatter w32 37.8 ms vs 2x w16 59.6 ms). Same math, same trajectory
    (tests/test_fm_kernel.py::test_packed_streaming_matches_unpacked)."""

    w0: jax.Array
    w0_accum: jax.Array
    packed: jax.Array  # [V, 32] = [table row (16) | adagrad accum (16)]


def pack_streaming_state(state: StreamingFMState) -> StreamingFMStatePacked:
    return StreamingFMStatePacked(
        w0=state.w0, w0_accum=state.w0_accum,
        packed=jnp.concatenate([state.table, state.accum], axis=1),
    )


def unpack_streaming_state(state: StreamingFMStatePacked) -> StreamingFMState:
    return StreamingFMState(
        w0=state.w0, w0_accum=state.w0_accum,
        table=state.packed[:, : K.D], accum=state.packed[:, K.D :],
    )


def streaming_init_packed(rng: jax.Array,
                          cfg: KernelFMConfig) -> StreamingFMStatePacked:
    return pack_streaming_state(streaming_init(rng, cfg))


def _packed_rank_core(cfg: KernelFMConfig, pulled, b, b_pad: int, R: int,
                      w0, w0_accum, lr, l2):
    """The pull->compute->update middle of the packed streaming step in
    RANK space: takes the gathered [R, 2D] packed rows, returns the
    updated [R, 2D] packed rows (masked past n_unique) plus the w0 pair
    and loss. Shared verbatim by the single-master (packed) and the
    range-partitioned steps so their trajectories are identical by
    construction."""
    n_k = cfg.factor
    D = K.D
    n_unique = b["n_unique"]
    rows = pulled[:, :D]
    acc = pulled[:, D:]
    rows = rows.at[R - 1].set(0.0)

    if cfg.xmat:
        loss, grad_rows, g0 = _xmat_rank_grads(
            cfg, rows, w0, b, b_pad, R)
    elif cfg.fused and "halves" in b:
        # SPLIT-fused: the fused kernel's stats block cannot compile at
        # b_pad=4096 (Mosaic tpu_compile_helper crash; b_pad<=2048 fine
        # — benchmarks/bench_fused_probe.py bisect), so the position
        # stream is partitioned by row-half on the host
        # (plan_to_arrays_split: stable subsequences of the rank-sorted
        # layout stay rank-sorted) and each half runs its own fused
        # call over the SHARED rank space. Rows partition cleanly
        # between halves, so stats are independent and grad_rows add;
        # total grid slots match one full-batch fused call.
        # r5 CAVEAT (PARITY.md split-fused rejection): at the production
        # zipf shape THIS branch still crashes the compiler when `rows`
        # is the [:, :16] slice of the packed pulled buffer and the
        # Adagrad tail consumes the other half (isolated in
        # benchmarks/bench_splitfused_isolate.py — the kernels alone
        # compile and run), and the compilable compositions measured
        # SLOWER than the fine core (both halves 5.47 ms vs fine core
        # 6.18 incl. optimizer). Production stays on cfg.fine; this
        # branch serves b_pad<=2048 regimes.
        rmask_p = b["row_mask_padded"]
        n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
        loss = jnp.float32(0.0)
        g0 = jnp.float32(0.0)
        grad_rows = jnp.zeros_like(rows)
        for hb in b["halves"]:
            bh = hb["labels_padded"].shape[0]
            stats, gr = K.fm_fused_step(
                rows, hb["ranks_sorted"], hb["rowid_sorted"],
                hb["xv_sorted"], hb["tile_base"], hb["labels_padded"],
                hb["row_mask_padded"] / n_valid, w0,
                n_k=n_k, b_pad=bh, n_rows=R,
                interpret=cfg.interpret, exact=cfg.exact,
            )
            loss = loss + jnp.sum(stats[:, K.S - 1])
            g0 = g0 + jnp.sum(stats[:, 0])
            grad_rows = grad_rows + gr
    elif cfg.fused:
        # ONE two-phase pallas_call for fwd+loss+duals+bwd (r4: the
        # streaming core is Mosaic GRID-OVERHEAD-bound at production
        # capacities — ~5.8 us/slot across the separate fwd/bwd kernel
        # sweeps; the fused kernel pays the sweep once. Measured core
        # 8.25 -> see PARITY partitioned-master row). Same math as the
        # branch below (tests/test_fm_partitioned.py pins equality).
        labels_p = b["labels_padded"]
        rmask_p = b["row_mask_padded"]
        n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
        stats, grad_rows = K.fm_fused_step(
            rows, b["ranks_sorted"], b["rowid_sorted"], b["xv_sorted"],
            b["tile_base"], labels_p, rmask_p / n_valid, w0,
            n_k=n_k, b_pad=b_pad, n_rows=R,
            interpret=cfg.interpret, exact=cfg.exact,
        )
        loss = jnp.sum(stats[:, K.S - 1])
        g0 = jnp.sum(stats[:, 0])
    else:
        rowsum, e_pos = kernel_forward(
            cfg, rows, b["ranks_sorted"], b["rowid_sorted"],
            b["xv_sorted"], b["tile_base"], b.get("tile_base_fine"),
            b_pad,
        )
        wx = rowsum[:, 0]
        s = rowsum[:, 1 : 1 + n_k]
        ss = rowsum[:, 1 + n_k : 1 + 2 * n_k]
        z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        labels_p = b["labels_padded"]
        rmask_p = b["row_mask_padded"]
        n_valid = jnp.maximum(jnp.sum(rmask_p), 1.0)
        per = (jnp.maximum(z, 0) - z * labels_p
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
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
        g0 = jnp.sum(dlogit)
    grad_rows = grad_rows + l2 * rows

    pos = jnp.arange(R)
    m = (pos < n_unique).astype(jnp.float32)[:, None]
    g = grad_rows * m
    acc_new = acc + g * g
    rows_new = rows - lr * g / (jnp.sqrt(acc_new) + 1e-7)
    w0_accum_new = w0_accum + g0 * g0
    w0_new = w0 - lr * g0 / (jnp.sqrt(w0_accum_new) + 1e-7)
    return jnp.concatenate([rows_new, acc_new], axis=1), w0_new, \
        w0_accum_new, loss


def make_streaming_train_step_packed(cfg: KernelFMConfig, capacity: int,
                                     b_pad: int):
    """Packed-layout twin of make_streaming_train_step: ONE master-table
    gather and ONE scatter-set per step (the pull/push halves of the PS
    cycle collapse into single row operations). Identical numerics —
    the scatter-set writes rows_pulled - update, which equals the
    unpacked scatter-add because uids are unique."""
    R = capacity
    if cfg.fine:
        assert R % (cfg.fine_nwin * WTILE) == 0, (
            f"cfg.fine streaming needs capacity % "
            f"{cfg.fine_nwin * WTILE} == 0, got {R}"
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMStatePacked, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        uids = b["uids"]
        n_unique = b["n_unique"]
        pulled = state.packed[uids]             # ONE [R, 32] gather
        packed_new, w0, w0_accum, loss = _packed_rank_core(
            cfg, pulled, b, b_pad, R, state.w0, state.w0_accum, lr, l2)
        pos = jnp.arange(R)
        safe_uids = jnp.where(pos < n_unique, uids, state.packed.shape[0])
        packed = state.packed.at[safe_uids].set(
            packed_new, mode="drop"
        )                                        # ONE [R, 32] scatter
        return StreamingFMStatePacked(w0, w0_accum, packed), loss

    return step


class StreamingFMStatePartitioned(NamedTuple):
    """Range-PARTITIONED packed master: parts[p] holds vocab rows
    [bounds[p-1], bounds[p]) as a separate [size_p, 2D] array.

    Why: XLA row-scatter cost is per-index and SCALES WITH THE TARGET
    TABLE'S SIZE (measured v5e: 34 ns/idx into 65k rows vs 160 ns/idx
    donated into 10M — benchmarks/bench_cache_probe.py,
    bench_partitioned_exchange.py), so splitting the 10M-row master into
    id-range partitions makes the hot head's exchange pay the small-
    table rate. Sorted ascending uids make each partition's batch rows a
    CONTIGUOUS rank range — per-partition operands are dynamic_slices,
    no extra row gathers. This is the reference's DHT range-sharding
    idea (consistent_hash.h:31-40) turned into a single-chip memory
    layout. Trajectories are bit-identical to the packed step (shared
    _packed_rank_core; tests/test_fm_partitioned.py).
    """

    w0: jax.Array
    w0_accum: jax.Array
    parts: tuple


def split_packed_by_bounds(packed, bounds: tuple) -> tuple:
    """Split a packed [V, W] master into range partitions (bounds
    ascending, bounds[-1] == V) — shared by the FM/NFM/W&D
    partition_streaming_state splitters."""
    V = packed.shape[0]
    assert tuple(sorted(bounds)) == tuple(bounds) and bounds[-1] == V, bounds
    parts, base = [], 0
    for b in bounds:
        parts.append(packed[base:b])
        base = b
    return tuple(parts)


def partition_streaming_state(state: StreamingFMStatePacked,
                              bounds: tuple) -> StreamingFMStatePartitioned:
    return StreamingFMStatePartitioned(
        state.w0, state.w0_accum,
        split_packed_by_bounds(state.packed, bounds))


def departition_streaming_state(
        state: StreamingFMStatePartitioned) -> StreamingFMStatePacked:
    return StreamingFMStatePacked(
        state.w0, state.w0_accum, jnp.concatenate(state.parts, axis=0))


def partition_caps_for(uids, n_unique: int, bounds: tuple,
                       slack: float = 0.25, multiple: int = 1024) -> tuple:
    """Host-side cap sizing from observed traffic: per-partition unique
    counts + slack, rounded up to `multiple` (one compile per cap
    tuple). The step REFUSES overflow at runtime via its overflow flag —
    callers re-plan with bigger caps or fall back to the packed step."""
    u = np.asarray(uids)[:n_unique]
    caps, base = [], 0
    for b in bounds:
        c = int(((u >= base) & (u < b)).sum())
        caps.append(int(np.ceil(c * (1 + slack) / multiple)) * multiple
                    + multiple)
        base = b
    return tuple(caps)


def make_partitioned_pull_push(n_features: int, capacity: int,
                               bounds: tuple, caps: tuple):
    """The range-partitioned master's exchange halves, factored so every
    streaming family (FM here; NFM in models/nfm_kernel) shares the
    SAME pull/push code against a parts tuple (see
    StreamingFMStatePartitioned for the layout and why it wins).

    pull(parts, b)  -> (pulled [R, 2D], starts, idx_ext, overflow)
    push(parts, packed_new, starts, idx_ext) -> new parts tuple
    """
    R = capacity
    V = n_features
    sizes = [bounds[0]] + [bounds[i] - bounds[i - 1]
                           for i in range(1, len(bounds))]
    bases = [0] + list(bounds[:-1])
    cap_max = max(caps)
    n_parts = len(bounds)
    th = jnp.asarray(np.asarray(bases, np.int32))

    def pull(parts, b):
        n_unique = b["n_unique"]
        D2 = parts[0].shape[1]
        pos = jnp.arange(R, dtype=jnp.int32)
        # ascending ids with V at padding (uids pads with 0s), then
        # extend by cap_max so dynamic_slice at offset starts[p] can
        # never clamp (XLA clamps OOB starts -> silent misalignment)
        idx = jnp.where(pos < n_unique, b["uids"].astype(jnp.int32),
                        jnp.int32(V))
        idx_ext = jnp.concatenate(
            [idx, jnp.full((cap_max,), V, jnp.int32)])
        # partition p covers ranks [starts[p], starts[p+1])
        starts = jnp.sum(idx[None, :] < th[:, None], axis=1).astype(jnp.int32)
        counts = jnp.concatenate(
            [starts[1:], n_unique[None].astype(jnp.int32)]) - starts
        overflow = jnp.any(counts > jnp.asarray(caps, jnp.int32))

        # ---- per-partition contiguous gathers into rank space
        buf = jnp.zeros((R + cap_max, D2))
        for p in range(n_parts):
            sp = starts[p]
            idx_p = jax.lax.dynamic_slice(idx_ext, (sp,), (caps[p],)) \
                - bases[p]
            got = parts[p][jnp.clip(idx_p, 0, sizes[p] - 1)]
            # overshoot rows (next partitions / padding) are overwritten
            # by later p; rows past n_unique stay zero via the mask below
            buf = jax.lax.dynamic_update_slice(buf, got, (sp, 0))
        pulled = buf[:R] * (pos < n_unique).astype(buf.dtype)[:, None]
        return pulled, starts, idx_ext, overflow

    def push(parts, packed_new, starts, idx_ext):
        D2 = packed_new.shape[1]
        packed_ext = jnp.concatenate(
            [packed_new, jnp.zeros((cap_max, D2))])
        new_parts = []
        for p in range(n_parts):
            sp = starts[p]
            idx_p = jax.lax.dynamic_slice(idx_ext, (sp,), (caps[p],)) \
                - bases[p]
            rows_p = jax.lax.dynamic_slice(packed_ext, (sp, 0),
                                           (caps[p], D2))
            # out-of-partition (negative would only occur on overflow;
            # >= size_p covers overshoot + padding) -> drop
            idx_p = jnp.where(idx_p < 0, sizes[p], idx_p)
            new_parts.append(
                parts[p].at[idx_p].set(rows_p, mode="drop"))
        return tuple(new_parts)

    return pull, push


def make_streaming_train_step_partitioned(cfg: KernelFMConfig,
                                          capacity: int, b_pad: int,
                                          bounds: tuple, caps: tuple):
    """Packed streaming step against a range-PARTITIONED master (see
    StreamingFMStatePartitioned). bounds: ascending id-range ends,
    bounds[-1] == n_features. caps: static per-partition rank budgets
    (partition_caps_for). Returns step(state, b, hyper) ->
    ((state, loss), overflow) where overflow (bool scalar) is True iff
    any partition's batch row count exceeded its cap — the updated state
    is then INCOMPLETE (uncovered rows unwritten). NOTE the donation
    contract: the step donates the input state (donate_argnums=(0,)),
    so by the time overflow reads True the PRE-step buffers are gone —
    a caller that wants to re-run the overflowed batch (through a
    packed step or with bigger caps) must keep its own host-side copy
    of the state from before the step; without one the only sound
    recovery is to continue from the partial state knowing the
    uncovered rows missed one update. The in-tree engine never hits
    this: it derives caps from true per-batch unique counts
    (partition_caps_for), making overflow structurally impossible, and
    asserts on the flag. Correctness never depends on cap sizing.

    Numerics: bit-identical to make_streaming_train_step_packed (shared
    _packed_rank_core; the pull/push split by partitions touches
    disjoint row ranges)."""
    R = capacity
    assert len(bounds) == len(caps) and bounds[-1] == cfg.n_features
    if cfg.fine:
        assert R % (cfg.fine_nwin * WTILE) == 0
    pull, push = make_partitioned_pull_push(cfg.n_features, R, bounds, caps)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMStatePartitioned, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        pulled, starts, idx_ext, overflow = pull(state.parts, b)
        packed_new, w0, w0_accum, loss = _packed_rank_core(
            cfg, pulled, b, b_pad, R, state.w0, state.w0_accum, lr, l2)
        new_parts = push(state.parts, packed_new, starts, idx_ext)
        return (StreamingFMStatePartitioned(w0, w0_accum, new_parts),
                loss), overflow

    return step


def make_streaming_train_step_fused_partitioned(
        cfg: KernelFMConfig, capacity: int, b_pad: int,
        bounds: tuple, caps: tuple):
    """ONE-dispatch streaming step on RAW [B, L] batches against the
    range-PARTITIONED master: the device planner is traced into the
    partitioned step (see make_streaming_train_step_partitioned for the
    layout, caps, and overflow contract). The B=256 fused step measured
    exchange-bound, not dispatch-bound (benchmarks/bench_kscan_stream.py)
    — this variant attacks exactly that exchange. Returns
    step(state, ids, vals, mask, labels, row_mask, hyper) ->
    ((state, loss), overflow)."""
    assert cfg.n_features < 2**31 - 1, (
        "device planner is int32 with INT32_MAX as the pad sentinel")
    assert not cfg.fine or (cfg.fine_tile == TILE and cfg.fine_nwin == 5), (
        "plan_batch_on_device emits 512-stride/5-window tile bases; "
        "custom fine_tile/fine_nwin need host plans (plan_batch)")
    inner = make_streaming_train_step_partitioned(cfg, capacity, b_pad,
                                                  bounds, caps)
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMStatePartitioned, ids, vals, mask, labels,
             row_mask, hyper=None):
        b = plan_raw(ids, vals, mask, labels, row_mask,
                     capacity=capacity, b_pad=b_pad, n_pad_multiple=None)
        return inner_raw(state, b, hyper)

    return step


def make_streaming_train_step_fused_partitioned_binary(
        cfg: KernelFMConfig, capacity: int, b_pad: int,
        bounds: tuple, caps: tuple):
    """make_streaming_train_step_fused_partitioned for BINARY batches:
    step(state, ids, labels) — vals/mask/row_mask are synthesized as
    ones IN-GRAPH, so the per-batch wire carries only ids (int32) +
    labels, ~1/3 of the general fused step's transfer. Exists because
    the honest end-to-end production row is TRANSFER-bound on this
    stack (~10 ms/MB over the tunnel, bench.py production_zipf_e2e_* /
    CLAUDE.md), and standard binary-feature CTR traffic (every libffm
    value 1, fixed L) doesn't need to ship constants. Trajectories
    identical to the general step on all-ones batches
    (tests/test_fm_partitioned.py)."""
    assert cfg.n_features < 2**31 - 1, (
        "device planner is int32 with INT32_MAX as the pad sentinel")
    assert not cfg.fine or (cfg.fine_tile == TILE and cfg.fine_nwin == 5), (
        "plan_batch_on_device emits 512-stride/5-window tile bases; "
        "custom fine_tile/fine_nwin need host plans (plan_batch)")
    inner = make_streaming_train_step_partitioned(cfg, capacity, b_pad,
                                                  bounds, caps)
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMStatePartitioned, ids, labels, hyper=None):
        ones = jnp.ones(ids.shape, jnp.float32)
        rmask = jnp.ones((ids.shape[0],), jnp.float32)
        b = plan_raw(ids, ones, ones, labels, rmask,
                     capacity=capacity, b_pad=b_pad, n_pad_multiple=None)
        return inner_raw(state, b, hyper)

    return step


def make_streaming_train_step_fused(cfg: KernelFMConfig, capacity: int,
                                    b_pad: int):
    """ONE-dispatch streaming step on RAW [B, L] batches: the device
    batch planner is traced INTO the packed train step, so a deployment
    minibatch costs a single program dispatch (transfer + plan + step).
    Over this tunneled backend each dispatch is ~0.4 ms, so collapsing
    the separate plan and step dispatches matters exactly in the
    small-batch serving/training regime the streaming engine targets
    (PARITY.md: 10.1 ms plan+step at B=256 -> fused measurement there).
    Numerics identical to plan_batch_on_device + the packed step
    (tests/test_fm_streaming.py)."""
    assert cfg.n_features < 2**31 - 1, (
        f"device planner is int32 with INT32_MAX as the pad sentinel; "
        f"n_features={cfg.n_features} would silently wrap/collide "
        f"(use host plan_batch, which is int64, beyond 2**31-2)")
    assert not cfg.fine or (cfg.fine_tile == TILE and cfg.fine_nwin == 5), (
        "plan_batch_on_device emits 512-stride/5-window tile bases; "
        "custom fine_tile/fine_nwin need host plans (plan_batch)")
    inner = make_streaming_train_step_packed(cfg, capacity, b_pad)
    # trace through the jitted wrappers (their donation marks don't apply
    # inside an outer jit); donation lives on THIS boundary instead
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFMStatePacked, ids, vals, mask, labels,
             row_mask, hyper=None):
        b = plan_raw(ids, vals, mask, labels, row_mask,
                     capacity=capacity, b_pad=b_pad, n_pad_multiple=None)
        return inner_raw(state, b, hyper)

    return step


@functools.partial(
    jax.jit, static_argnames=("capacity", "b_pad", "n_pad_multiple")
)
def plan_batch_on_device(ids, vals, mask, labels, row_mask,
                         capacity: int, b_pad: int,
                         n_pad_multiple: int | None = None) -> dict:
    """DEVICE-side batch planning for the streaming kernel step: one
    argsort + cumsum dedup + tile-window extraction, entirely under ONE
    jit (eager ops each dispatch separately over the tunneled backend —
    ~25 dispatches ≈ 8 ms/batch; jitted it is one) — no host numpy in the
    per-batch path. Replaces plan_batch's host argsort (the reference
    worker builds its per-batch key set inline the same way,
    distributed_algo_abst.h:181-190).

    ids/vals/mask: [B, L] device arrays; labels/row_mask: [B].
    capacity: static unique-rank space (multiple of 2*TILE, > max uniques
    per batch); b_pad: static lane-aligned batch padding (>= B).
    n_pad_multiple: pad the position space to this multiple (default TILE;
    the data-sharded step needs n_data * TILE so each data shard gets an
    equal whole number of tiles).
    Returns the dict make_streaming_train_step consumes.

    Feature ids must be < 2**31 - 1: ids are cast to int32 and INT32_MAX
    is the invalid-position sentinel (the host plan_batch works in
    int64). The fused step factory guards this at build time.
    """
    from ..ops.embedding_pallas import TILE

    B, L = ids.shape
    n = B * L
    mult = TILE if n_pad_multiple is None else n_pad_multiple
    assert mult % TILE == 0, f"n_pad_multiple {mult} must be a multiple of {TILE}"
    n_pad = (n + mult - 1) // mult * mult
    flat = ids.reshape(-1).astype(jnp.int32)
    valid = mask.reshape(-1) > 0
    sentinel = jnp.int32(2**31 - 1)
    keyed = jnp.where(valid, flat, sentinel)
    if n_pad > n:
        keyed = jnp.concatenate(
            [keyed, jnp.full((n_pad - n,), sentinel, jnp.int32)]
        )
    order = jnp.argsort(keyed)
    sorted_ids = keyed[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    is_new = jnp.where(sorted_ids == sentinel, 0, is_new)
    ranks = jnp.cumsum(is_new) - 1
    n_unique = jnp.sum(is_new)

    pad_rank = capacity - 1
    ranks_sorted = jnp.where(
        sorted_ids == sentinel, pad_rank, ranks
    ).astype(jnp.int32)
    # uids[rank] = id for first-occurrence positions; others dropped
    take = jnp.where(is_new > 0, ranks, capacity)
    uids = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[take].set(jnp.where(sorted_ids == sentinel, 0, sorted_ids),
                      mode="drop")[:capacity]
    )
    tile_base = jnp.minimum(
        ranks_sorted[::TILE] // TILE, capacity // TILE - 2
    ).astype(jnp.int32)
    tile_base_fine = jnp.minimum(
        ranks_sorted[::TILE] // WTILE, max(capacity // WTILE - 5, 0)
    ).astype(jnp.int32)

    xv = (vals * mask).reshape(-1)
    if n_pad > n:
        xv = jnp.concatenate([xv, jnp.zeros((n_pad - n,))])
    xv_sorted = xv[order]
    # padded positions (order >= n) map past B; with b_pad >= B their row
    # one-hot never matches, so they contribute nothing either way
    rowid_sorted = (order // L).astype(jnp.int32)

    labels_p = jnp.zeros((b_pad,)).at[:B].set(labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(row_mask)
    return {
        "uids": uids,
        "n_unique": n_unique.astype(jnp.int32),
        "ranks_sorted": ranks_sorted,
        "rowid_sorted": rowid_sorted,
        "xv_sorted": xv_sorted,
        "tile_base": tile_base,
        "tile_base_fine": tile_base_fine,
        "labels_padded": labels_p,
        "row_mask_padded": rmask_p,
    }


def plan_to_arrays(plan: BatchPlan, capacity: int) -> dict:
    """Per-batch runtime arrays for make_streaming_train_step. The plan
    must be built with n_rows_pad=capacity so shapes are stable."""
    assert plan.n_rows_pad == capacity, (
        f"plan built with R={plan.n_rows_pad}, step expects {capacity}"
    )
    b_pad = plan.b_pad
    B = plan.labels.shape[0]
    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    tbf = plan.tile_base_fine
    if tbf is None:
        tbf = jnp.minimum(
            plan.ranks_sorted[::TILE] // WTILE,
            max(capacity // WTILE - 5, 0),
        ).astype(jnp.int32)
    return {
        "uids": jnp.asarray(plan.uids[:capacity]),
        "n_unique": jnp.int32(plan.n_unique),
        "ranks_sorted": plan.ranks_sorted,
        "rowid_sorted": plan.rowid_sorted,
        "xv_sorted": plan.xv_sorted,
        "tile_base": plan.tile_base,
        "tile_base_fine": tbf,
        "labels_padded": labels_p,
        "row_mask_padded": rmask_p,
    }


def plan_to_arrays_split(plan: BatchPlan, capacity: int,
                         n_halves: int = 2) -> dict:
    """plan_to_arrays plus a `halves` tuple: the position stream
    partitioned by row-block into `n_halves` independently fused-able
    sub-streams. A stable subsequence of the rank-sorted layout stays
    rank-sorted, so each half keeps the window-locality invariant; pad
    slots carry rank=capacity-1 / xv=0 (harmless, sorted-at-end).

    Exists because fm_fused_step's stats block cannot compile past
    b_pad=2048 on this stack (bench_fused_probe.py) — with halves the
    fused core covers b_pad=4096 production batches
    (_packed_rank_core split-fused branch, equality-tested)."""
    import numpy as np

    arrays = plan_to_arrays(plan, capacity)
    n = int(plan.ranks_sorted.shape[0])
    b_pad = plan.b_pad
    assert b_pad % n_halves == 0, (b_pad, n_halves)
    bh = b_pad // n_halves
    rowid = np.asarray(plan.rowid_sorted)
    ranks = np.asarray(plan.ranks_sorted)
    xv = np.asarray(plan.xv_sorted)
    labels_p = np.asarray(arrays["labels_padded"])
    rmask_p = np.asarray(arrays["row_mask_padded"])
    # size the half buffers from the ACTUAL max per-half count: padded
    # positions carry a real rowid (order // L), so a half whose row range
    # holds the padding can exceed ceil(n/n_halves) — sizing beats asserting
    sels = [(rowid >= h * bh) & (rowid < (h + 1) * bh)
            for h in range(n_halves)]
    n_h = max(-(-n // n_halves),
              max(int(s.sum()) for s in sels))
    n_h = -(-n_h // TILE) * TILE
    halves = []
    for h in range(n_halves):
        sel = sels[h]
        cnt = int(sel.sum())
        rk = np.full(n_h, capacity - 1, np.int32)
        rk[:cnt] = ranks[sel]
        rd = np.full(n_h, bh - 1, np.int32)
        rd[:cnt] = rowid[sel] - h * bh
        xh = np.zeros(n_h, np.float32)
        xh[:cnt] = xv[sel]
        tb = np.minimum(rk[::TILE] // TILE, capacity // TILE - 2)
        halves.append({
            "ranks_sorted": jnp.asarray(rk),
            "rowid_sorted": jnp.asarray(rd),
            "xv_sorted": jnp.asarray(xh),
            "tile_base": jnp.asarray(tb.astype(np.int32)),
            "labels_padded": jnp.asarray(labels_p[h * bh:(h + 1) * bh]),
            "row_mask_padded": jnp.asarray(rmask_p[h * bh:(h + 1) * bh]),
        })
    arrays["halves"] = tuple(halves)
    return arrays


def export_tables(state: KernelFMState, plan: BatchPlan, cfg: KernelFMConfig):
    """Materialise (w [V], v [V, K]) in full vocabulary space."""
    w_full = np.zeros((cfg.n_features,), np.float32)
    v_full = np.zeros((cfg.n_features, cfg.factor), np.float32)
    rows = np.asarray(state.rows)
    uids = plan.uids[: plan.n_unique]
    w_full[uids] = rows[: plan.n_unique, 0]
    v_full[uids] = rows[: plan.n_unique, 1 : 1 + cfg.factor]
    return float(state.w0), w_full, v_full
