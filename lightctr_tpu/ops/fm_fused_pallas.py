"""Fully-fused Pallas FM training step over the sorted-COO layout.

Builds on ops/embedding_pallas.py's window trick and adds the missing
piece: per-ROW reduction (the FM sums) without per-element indexing, by a
second one-hot matmul against row ids. The whole hot path is MXU matmuls:

  KERNEL A (fwd, grid over position tiles):
     e_pos   = onehot(rank) @ rows_window          [T, D]   (w|v packed)
     terms   = [w*x, v*x, (v*x)^2]                 [T, S]
     rowsum += onehot(row)^T @ terms               [Bp, S]  (revisited block)
     also emits e_pos for the backward.

  (tiny XLA glue: logits -> dlogits, s -> packed duals)

  KERNEL B (bwd, grid over position tiles) — generalised dual form:
     duals_pos = onehot(row) @ duals               [T, S]
     dwv_pos   = [dlogit*x, (a - b*v*x)*x]         [T, D]
  where per-row duals pack [dlogit | a(K) | b(K)]. This one kernel serves
  every sum-of-squares-family model:
     FM  (y = .. + 0.5*sum(s^2-ss)):      a = dlogit*s,  b = dlogit
     NFM (y = .. + MLP(0.5*(s^2-ss))):    a = g_pool*s,  b = g_pool
  (derivation: d(0.5 s_k^2 - 0.5 ss_k)/dv_pk = (s_k - v_pk x_p) x_p,
  matching the reference FM backward train_fm_algo.cpp:90-118).

  blocked_scatter_add (embedding_pallas): dwv_pos -> grad_rows [R, D]

Layout: D = 16 (w in col 0, v in cols 1..K<=15, zero pad), S = 32
(terms: wx | vx[K] | vx^2[K] | pad; duals: dlogit | a[K] | b[K] | pad,
so K <= 15 both ways).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .embedding_pallas import TILE, WTILE, blocked_scatter_add

D = 16   # packed row width: [w, v(K<=15), pad]
S = 32   # terms/duals width


def _fwd_kernel(base_ref, ranks_ref, rowid_ref, xv_ref,
                rows0_ref, rows1_ref, rowsum_ref, epos_ref, *, n_k: int, b_pad: int,
                cdt=jnp.bfloat16):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        rowsum_ref[...] = jnp.zeros_like(rowsum_ref)

    base = base_ref[t] * TILE
    local = ranks_ref[...] - base                         # [T, 1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1)
    onehot_rank = (local == iota_r).astype(cdt)
    window = jnp.concatenate([rows0_ref[...], rows1_ref[...]], axis=0)
    e = jax.lax.dot_general(
        onehot_rank, window,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [T, D]
    epos_ref[...] = e

    xv = xv_ref[...]                                      # [T, 1]
    w = e[:, 0:1]                                         # [T, 1]
    v = e[:, 1:1 + n_k]                                   # [T, K]
    wx = w * xv                                           # [T, 1]
    vx = v * xv                                           # [T, K]
    vx2 = vx * vx
    pad = jnp.zeros((TILE, S - 1 - 2 * n_k), jnp.float32)
    terms = jnp.concatenate([wx, vx, vx2, pad], axis=1)   # [T, S]

    rid = rowid_ref[...]                                  # [T, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TILE, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)              # [T, Bp]
    rowsum_ref[...] += jax.lax.dot_general(
        onehot_row, terms.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),       # onehot^T @ terms
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("n_k", "b_pad", "interpret", "exact"))
def fm_forward(rows, ranks_sorted, rowid_sorted, xv_sorted, tile_base,
               n_k: int, b_pad: int, interpret: bool = False, exact: bool = False):
    """-> (rowsum [b_pad, S], e_pos [n, D]).   rowsum cols: wx | s(K) | ss(K)."""
    n = ranks_sorted.shape[0]
    n_tiles = n // TILE
    cdt = jnp.float32 if exact else jnp.bfloat16
    rows16 = rows.astype(cdt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((TILE, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((TILE, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((TILE, D), lambda t, base: (base[t], 0)),
            pl.BlockSpec((TILE, D), lambda t, base: (base[t] + 1, 0)),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, S), lambda t, base: (0, 0)),
            pl.BlockSpec((TILE, D), lambda t, base: (t, 0)),
        ),
    )
    kernel = functools.partial(_fwd_kernel, n_k=n_k, b_pad=b_pad, cdt=cdt)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((n, D), jnp.float32),
        ),
        interpret=interpret,
    )(
        tile_base,
        ranks_sorted.reshape(n, 1),
        rowid_sorted.reshape(n, 1),
        xv_sorted.astype(jnp.float32).reshape(n, 1),
        rows16,
        rows16,
    )


def _fwd_fine_kernel(base_ref, ranks_ref, rowid_ref, xv_ref, *refs,
                     n_k: int, b_pad: int, n_win: int, tile: int,
                     cdt=jnp.bfloat16):
    rows_refs = refs[:n_win]
    rowsum_ref, epos_ref = refs[n_win], refs[n_win + 1]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        rowsum_ref[...] = jnp.zeros_like(rowsum_ref)

    base = base_ref[t] * WTILE
    local = ranks_ref[...] - base                         # [T, 1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, n_win * WTILE), 1)
    onehot_rank = (local == iota_r).astype(cdt)
    window = jnp.concatenate([r[...] for r in rows_refs], axis=0)
    e = jax.lax.dot_general(
        onehot_rank, window,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [T, D]
    epos_ref[...] = e

    xv = xv_ref[...]                                      # [T, 1]
    w = e[:, 0:1]
    v = e[:, 1:1 + n_k]
    wx = w * xv
    vx = v * xv
    vx2 = vx * vx
    pad = jnp.zeros((tile, S - 1 - 2 * n_k), jnp.float32)
    terms = jnp.concatenate([wx, vx, vx2, pad], axis=1)   # [T, S]

    rid = rowid_ref[...]                                  # [T, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (tile, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)              # [T, Bp]
    rowsum_ref[...] += jax.lax.dot_general(
        onehot_row, terms.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_k", "b_pad", "n_win", "tile", "interpret", "exact"))
def fm_forward_fine(rows, ranks_sorted, rowid_sorted, xv_sorted, tile_base,
                    n_k: int, b_pad: int, n_win: int = 5, tile: int = TILE,
                    interpret: bool = False, exact: bool = False):
    """fm_forward with an n_win x WTILE=128 rank window (tile_base in
    WTILE units): ~37% fewer one-hot compares / matmul MACs at the default
    TILE=512 (window 640 rows vs 1024)."""
    n = ranks_sorted.shape[0]
    n_tiles = n // tile
    cdt = jnp.float32 if exact else jnp.bfloat16
    rows_c = rows.astype(cdt)
    D_ = rows.shape[1]

    def rows_spec(i):
        return pl.BlockSpec((WTILE, D_),
                            lambda t, base, i=i: (base[t] + i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((tile, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((tile, 1), lambda t, base: (t, 0)),
        ] + [rows_spec(i) for i in range(n_win)],
        out_specs=(
            pl.BlockSpec((b_pad, S), lambda t, base: (0, 0)),
            pl.BlockSpec((tile, D_), lambda t, base: (t, 0)),
        ),
    )
    kernel = functools.partial(_fwd_fine_kernel, n_k=n_k, b_pad=b_pad,
                               n_win=n_win, tile=tile, cdt=cdt)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((n, D_), jnp.float32),
        ),
        interpret=interpret,
    )(
        tile_base,
        ranks_sorted.reshape(n, 1),
        rowid_sorted.reshape(n, 1),
        xv_sorted.astype(jnp.float32).reshape(n, 1),
        *([rows_c] * n_win),
    )


# ---------------------------------------------------------------------------
# Merged backward+scatter (fine windows): one pallas_call computes the
# per-position gradients AND accumulates them into the mod-n_win residue
# row buffers. Unlike the two-phase mega-kernel (whose phase-1 e-recompute
# made it a net loss, PARITY.md), nothing here is recomputed: the backward
# needs only position-space inputs (e_pos from the forward, duals from the
# XLA loss math), and the rank one-hot built for the scatter is the only
# one-hot this pass needs. vs the separate fm_backward_positions +
# blocked_scatter_add_fine pair this removes one full grid pass and the
# dwv_pos [n, D] HBM write+read — the profiled step is grid-overhead
# bound (PARITY.md), so the saved pass is the point.


def _bwd_scatter_fine_kernel(base_ref, ranks_ref, rowid_ref, xv_ref,
                             epos_ref, duals_ref, *out_refs, n_k: int,
                             b_pad: int, n_win: int, tile: int,
                             cdt=jnp.bfloat16):
    t = pl.program_id(0)

    # backward in position space (dwv never leaves VMEM)
    rid = rowid_ref[...]                                    # [T, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (tile, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)
    duals_pos = jax.lax.dot_general(
        onehot_row, duals_ref[...].astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [T, S]
    dlogit = duals_pos[:, 0:1]
    a = duals_pos[:, 1:1 + n_k]
    b_col = duals_pos[:, 1 + n_k:1 + 2 * n_k]
    xv = xv_ref[...]
    v = epos_ref[...][:, 1:1 + n_k]
    dw = dlogit * xv
    dv = (a - b_col * v * xv) * xv
    pad = jnp.zeros((tile, D - 1 - n_k), jnp.float32)
    dwv = jnp.concatenate([dw, dv, pad], axis=1)            # [T, D]

    # mod-n_win residue scatter (blocked_scatter_add_fine's scheme)
    b = base_ref[t]
    prev = base_ref[jnp.maximum(t - 1, 0)]
    local = ranks_ref[...] - b * WTILE
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, n_win * WTILE), 1)
    onehot = (local == iota_r).astype(cdt)
    contrib = jax.lax.dot_general(
        onehot, dwv.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [n_win*W, D]
    for j in range(n_win):
        off_j = jnp.mod(j - b, n_win)
        blk_j = b + off_j
        prev_blk = prev + jnp.mod(j - prev, n_win)

        def _zero(j=j):
            out_refs[j][...] = jnp.zeros_like(out_refs[j])

        pl.when((t == 0) | (blk_j != prev_blk))(_zero)
        chunk = jnp.zeros((WTILE, contrib.shape[1]), jnp.float32)
        for i in range(n_win):
            chunk = jnp.where(
                off_j == i, contrib[i * WTILE:(i + 1) * WTILE], chunk)
        out_refs[j][...] += chunk


@functools.partial(
    jax.jit,
    static_argnames=("n_k", "b_pad", "n_rows", "n_win", "tile",
                     "interpret", "exact"))
def fm_backward_scatter_fine(rowid_sorted, xv_sorted, e_pos, duals,
                             ranks_sorted, tile_base, n_k: int, b_pad: int,
                             n_rows: int, n_win: int = 5, tile: int = TILE,
                             interpret: bool = False, exact: bool = False):
    """duals [b_pad, S] + e_pos [n, D] -> grad_rows [n_rows, D] in ONE
    pass (fm_backward_positions folded into blocked_scatter_add_fine).
    tile_base in WTILE units; n_rows % (n_win * WTILE) == 0."""
    n = ranks_sorted.shape[0]
    n_tiles = n // tile
    n_blocks = n_rows // WTILE
    assert n_blocks % n_win == 0
    per = n_blocks // n_win
    cdt = jnp.float32 if exact else jnp.bfloat16

    def out_spec(j):
        def imap(t, base, j=j):
            b = base[t]
            return ((b + jnp.mod(j - b, n_win)) // n_win, 0)

        return pl.BlockSpec((WTILE, D), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((tile, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((tile, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((tile, D), lambda t, base: (t, 0)),
            pl.BlockSpec((b_pad, S), lambda t, base: (0, 0)),
        ],
        out_specs=tuple(out_spec(j) for j in range(n_win)),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_scatter_fine_kernel, n_k=n_k, b_pad=b_pad,
                          n_win=n_win, tile=tile, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_rows // n_win, D), jnp.float32)
            for _ in range(n_win)
        ),
        interpret=interpret,
    )(
        tile_base,
        ranks_sorted.reshape(n, 1),
        rowid_sorted.reshape(n, 1),
        xv_sorted.astype(jnp.float32).reshape(n, 1),
        e_pos,
        duals,
    )

    touched = jnp.zeros((n_blocks,), jnp.bool_).at[
        (tile_base[:, None] + jnp.arange(n_win)[None, :]).reshape(-1)
    ].set(True)
    touched = touched.reshape(per, n_win)
    stacked = jnp.stack([o.reshape(per, WTILE, D) for o in outs], axis=1)
    stacked = jnp.where(touched[:, :, None, None], stacked, 0.0)
    return stacked.reshape(n_rows, D)


def _row_reduce_kernel(rowid_ref, vals_ref, out_ref, *, b_pad: int,
                       cdt=jnp.bfloat16):
    """out[b] += sum of vals at positions with rowid==b (single revisited
    output block; used with e_pos/terms computed outside — the slim
    forward when run_ops handle the rank gather)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rid = rowid_ref[...]                                  # [T, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TILE, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)
    out_ref[...] += jax.lax.dot_general(
        onehot_row, vals_ref[...].astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("b_pad", "interpret", "exact"))
def row_reduce(rowid_sorted, vals, b_pad: int, interpret: bool = False,
               exact: bool = False):
    """[n, W] position values -> [b_pad, W] per-row sums (W % 8 == 0)."""
    n = rowid_sorted.shape[0]
    n_tiles = n // TILE
    W = vals.shape[1]
    cdt = jnp.float32 if exact else jnp.bfloat16
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE, W), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((b_pad, W), lambda t: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_row_reduce_kernel, b_pad=b_pad, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, W), jnp.float32),
        interpret=interpret,
    )(rowid_sorted.reshape(n, 1), vals)


def _bwd_kernel(rowid_ref, xv_ref, epos_ref, duals_ref, dwv_ref,
                *, n_k: int, b_pad: int, cdt=jnp.bfloat16):
    rid = rowid_ref[...]                                    # [T, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TILE, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)                # [T, Bp]
    duals_pos = jax.lax.dot_general(
        onehot_row, duals_ref[...].astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [T, S]
    dlogit = duals_pos[:, 0:1]                              # [T, 1]
    a = duals_pos[:, 1:1 + n_k]                             # [T, K]
    b = duals_pos[:, 1 + n_k:1 + 2 * n_k]                   # [T, K]
    xv = xv_ref[...]                                        # [T, 1]
    e = epos_ref[...]
    v = e[:, 1:1 + n_k]
    dw = dlogit * xv                                        # [T, 1]
    dv = (a - b * v * xv) * xv                              # [T, K]
    pad = jnp.zeros((TILE, D - 1 - n_k), jnp.float32)
    dwv_ref[...] = jnp.concatenate([dw, dv, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("n_k", "b_pad", "interpret", "exact"))
def fm_backward_positions(rowid_sorted, xv_sorted, e_pos, duals,
                          n_k: int, b_pad: int, interpret: bool = False,
                          exact: bool = False):
    """duals [b_pad, S] (cols: dlogit | s(K)) -> dwv_pos [n, D]."""
    n = rowid_sorted.shape[0]
    n_tiles = n // TILE
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE, 1), lambda t: (t, 0)),
            pl.BlockSpec((TILE, D), lambda t: (t, 0)),
            pl.BlockSpec((b_pad, S), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda t: (t, 0)),
    )
    cdt = jnp.float32 if exact else jnp.bfloat16
    kernel = functools.partial(_bwd_kernel, n_k=n_k, b_pad=b_pad, cdt=cdt)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
        interpret=interpret,
    )(
        rowid_sorted.reshape(n, 1),
        xv_sorted.astype(jnp.float32).reshape(n, 1),
        e_pos,
        duals,
    )


# ---------------------------------------------------------------------------
# Two-phase mega-kernel: the ENTIRE FM training step's hot path in ONE
# pallas_call. Grid (2, n_tiles), phase-major:
#
#   phase 0 (per position tile): gather e = onehot(rank) @ window, terms,
#     rowsum accumulated in a VMEM scratch (never leaves the chip).
#   phase boundary (first phase-1 step): logits -> per-row loss -> dlogit
#     -> packed duals, all computed in-kernel from the scratch rowsum
#     (labels/row-mask are inputs); duals persist in a second scratch.
#   phase 1 (per position tile): duals_pos = onehot(row) @ duals,
#     e recomputed from onehot(rank) @ window (cheaper than an HBM
#     round-trip of e_pos, and the SAME one-hot then drives the scatter),
#     dwv -> parity-split scatter accumulation (blocked_scatter_add's
#     even/odd scheme) into the [R, D] gradient.
#
# vs the 3-call pipeline (fm_forward + fm_backward_positions +
# blocked_scatter_add + XLA glue): saves the e_pos/duals/dwv HBM
# round-trips and two kernel dispatches; the remaining cost is the four
# one-hot builds (2 per phase), which are the measured floor (PARITY.md).
#
# Outputs: stats [b_pad, S] (cols: duals | logit(S-2) | masked loss(S-1)),
# gradA/gradB parity halves of grad_rows [R, D]. The optimizer stays in
# XLA (elementwise on [R, 16]; XLA fuses it into one pass).


def _mega_kernel(base_ref, ranks_ref, rowid_ref, xv_ref,
                 rows0_ref, rows1_ref, labels_ref, rmaskn_ref, w0_ref,
                 stats_ref, outA_ref, outB_ref,
                 rowsum_sc, duals_sc,
                 *, n_k: int, b_pad: int, cdt=jnp.bfloat16):
    phase = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    base = base_ref[t]
    local = ranks_ref[...] - base * TILE                    # [T, 1]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1)
    onehot_rank = (local == iota_r).astype(cdt)             # [T, 2T]
    window = jnp.concatenate([rows0_ref[...], rows1_ref[...]], axis=0)
    e = jax.lax.dot_general(
        onehot_rank, window,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [T, D]
    xv = xv_ref[...]                                        # [T, 1]
    v = e[:, 1:1 + n_k]                                     # [T, K]

    rid = rowid_ref[...]                                    # [T, 1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TILE, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)                # [T, Bp]

    @pl.when(phase == 0)
    def _fwd():
        @pl.when(t == 0)
        def _():
            rowsum_sc[...] = jnp.zeros_like(rowsum_sc)
            # park zeros in the resident output buffers so the flush at
            # the phase boundary writes zeros, not garbage
            outA_ref[...] = jnp.zeros_like(outA_ref)
            outB_ref[...] = jnp.zeros_like(outB_ref)
            stats_ref[...] = jnp.zeros_like(stats_ref)

        w = e[:, 0:1]
        wx = w * xv
        vx = v * xv
        vx2 = vx * vx
        pad = jnp.zeros((TILE, S - 1 - 2 * n_k), jnp.float32)
        terms = jnp.concatenate([wx, vx, vx2, pad], axis=1)  # [T, S]
        rowsum_sc[...] += jax.lax.dot_general(
            onehot_row, terms.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(phase == 1)
    def _bwd():
        @pl.when(t == 0)
        def _boundary():
            rowsum = rowsum_sc[...]                          # [Bp, S]
            wx = rowsum[:, 0:1]
            s = rowsum[:, 1:1 + n_k]
            ss = rowsum[:, 1 + n_k:1 + 2 * n_k]
            z = w0_ref[0, 0] + wx + 0.5 * jnp.sum(
                s * s - ss, axis=-1, keepdims=True)          # [Bp, 1]
            y = labels_ref[...]                              # [Bp, 1]
            rmn = rmaskn_ref[...]                            # [Bp, 1] mask/n
            per = (jnp.maximum(z, 0) - z * y
                   + jnp.log1p(jnp.exp(-jnp.abs(z)))) * rmn
            dlogit = (jax.nn.sigmoid(z) - y) * rmn           # [Bp, 1]
            # static-slice construction (Mosaic has no dynamic_update_slice)
            mid_pad = jnp.zeros((b_pad, S - 3 - 2 * n_k), jnp.float32)
            parts = [dlogit, dlogit * s,
                     jnp.broadcast_to(dlogit, (b_pad, n_k))]
            duals_sc[...] = jnp.concatenate(
                parts + [mid_pad, jnp.zeros((b_pad, 2), jnp.float32)], axis=1)
            stats_ref[...] = jnp.concatenate(
                parts + [mid_pad, z, per], axis=1)

        duals_pos = jax.lax.dot_general(
            onehot_row, duals_sc[...].astype(cdt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [T, S]
        dlogit_p = duals_pos[:, 0:1]
        a = duals_pos[:, 1:1 + n_k]
        b = duals_pos[:, 1 + n_k:1 + 2 * n_k]
        dw = dlogit_p * xv
        dv = (a - b * v * xv) * xv
        pad = jnp.zeros((TILE, D - 1 - n_k), jnp.float32)
        dwv = jnp.concatenate([dw, dv, pad], axis=1)         # [T, D]

        # parity-split scatter (see _scatter_kernel)
        par = base % 2
        b_even = base + par
        b_odd = base + 1 - par
        prev = base_ref[jnp.maximum(t - 1, 0)]
        prev_even = prev + (prev % 2)
        prev_odd = prev + 1 - (prev % 2)

        contrib = jax.lax.dot_general(
            onehot_rank, dwv.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [2T, D]
        lowers = contrib[:TILE]
        uppers = contrib[TILE:]
        is_even = (par == 0)
        newA = jnp.where(is_even, lowers, uppers)
        newB = jnp.where(is_even, uppers, lowers)

        @pl.when((t == 0) | (b_even != prev_even))
        def _():
            outA_ref[...] = jnp.zeros_like(outA_ref)

        @pl.when((t == 0) | (b_odd != prev_odd))
        def _():
            outB_ref[...] = jnp.zeros_like(outB_ref)

        outA_ref[...] += newA
        outB_ref[...] += newB


@functools.partial(
    jax.jit,
    static_argnames=("n_k", "b_pad", "n_rows", "interpret", "exact"),
)
def fm_fused_step(rows, ranks_sorted, rowid_sorted, xv_sorted, tile_base,
                  labels_p, rmask_norm, w0,
                  n_k: int, b_pad: int, n_rows: int,
                  interpret: bool = False, exact: bool = False):
    """One-call fused FM step hot path.

    rows [R, D]; sorted-layout batch arrays as in fm_forward; labels_p
    [b_pad], rmask_norm [b_pad] = row_mask / n_valid; w0 scalar.
    Returns (stats [b_pad, S], grad_rows [R, D]):
      stats cols: 0 dlogit | 1..K a | 1+K..2K b | S-2 logits | S-1 masked
      per-row losses (sum = batch loss; sum of col 0 = w0 grad).
    """
    n = ranks_sorted.shape[0]
    n_tiles = n // TILE
    n_blocks = n_rows // TILE
    assert n_blocks % 2 == 0
    cdt = jnp.float32 if exact else jnp.bfloat16
    rows16 = rows.astype(cdt)

    # scatter outputs pin to block 0 through phase 0 (buffer holds the
    # parked zeros; first index change flushes them harmlessly to block 0)
    def a_map(p, t, base):
        b = base[t]
        return (jnp.where(p == 1, (b + b % 2) // 2, 0), 0)

    def b_map(p, t, base):
        b = base[t]
        return (jnp.where(p == 1, (b + 1 - b % 2 - 1) // 2, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda p, t, base: (t, 0)),
            pl.BlockSpec((TILE, 1), lambda p, t, base: (t, 0)),
            pl.BlockSpec((TILE, 1), lambda p, t, base: (t, 0)),
            pl.BlockSpec((TILE, D), lambda p, t, base: (base[t], 0)),
            pl.BlockSpec((TILE, D), lambda p, t, base: (base[t] + 1, 0)),
            pl.BlockSpec((b_pad, 1), lambda p, t, base: (0, 0)),
            pl.BlockSpec((b_pad, 1), lambda p, t, base: (0, 0)),
            pl.BlockSpec((1, 1), lambda p, t, base: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, S), lambda p, t, base: (0, 0)),
            pl.BlockSpec((TILE, D), a_map),
            pl.BlockSpec((TILE, D), b_map),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, S), jnp.float32),
            pltpu.VMEM((b_pad, S), jnp.float32),
        ],
    )
    kernel = functools.partial(_mega_kernel, n_k=n_k, b_pad=b_pad, cdt=cdt)
    stats, outA, outB = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((n_rows // 2, D), jnp.float32),
            jax.ShapeDtypeStruct((n_rows // 2, D), jnp.float32),
        ),
        interpret=interpret,
    )(
        tile_base,
        ranks_sorted.reshape(n, 1),
        rowid_sorted.reshape(n, 1),
        xv_sorted.astype(jnp.float32).reshape(n, 1),
        rows16,
        rows16,
        labels_p.astype(jnp.float32).reshape(b_pad, 1),
        rmask_norm.astype(jnp.float32).reshape(b_pad, 1),
        w0.astype(jnp.float32).reshape(1, 1),
    )

    half = n_blocks // 2
    blocks_a = (tile_base + tile_base % 2) // 2
    blocks_b = (tile_base + 1 - tile_base % 2 - 1) // 2
    touched_a = jnp.zeros((half,), jnp.bool_).at[blocks_a].set(True)
    touched_b = jnp.zeros((half,), jnp.bool_).at[blocks_b].set(True)
    outA = jnp.where(touched_a[:, None, None],
                     outA.reshape(half, TILE, D), 0.0)
    outB = jnp.where(touched_b[:, None, None],
                     outB.reshape(half, TILE, D), 0.0)
    grad_rows = jnp.stack([outA, outB], axis=1).reshape(n_rows, D)
    return stats, grad_rows
