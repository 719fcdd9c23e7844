"""Pallas TPU kernels: blocked one-hot embedding gather / scatter-add.

THE hot ops of sparse CTR training. XLA's gather/scatter on TPU pay a
per-element dynamic-indexing cost (~1.7 ns/elem measured on v5e — 5.4 ms
to gather 384k x 8 rows); these kernels reformulate both as MXU matmuls
against on-the-fly one-hot tiles, exploiting a sorted-by-rank batch
layout (ids deduplicated to dense "ranks", positions sorted by rank):

  gather:   out[p]  = rows[rank[p]]          = onehot(rank_tile) @ rows_window
  scatter:  grad[r] = sum_{p: rank[p]=r} g[p] = onehot(rank_tile)^T @ g_tile

Sortedness bounds the window: a tile of T positions with ascending ranks
spans < T distinct ranks, so an aligned 2T-row window of the rows array
always covers it -> each grid step touches exactly two [T, D] blocks.
No per-element indexing anywhere; the MXU does the routing.

Capability lineage: replaces the reference PS's per-key pull/push loops
(pull.h:111-134, paramserver.h:141-179) and is the fused
"embedding lookup/scatter-add" kernel called for by BASELINE.json.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Tile of positions processed per grid step; also the rows-block size.
TILE = 512


# ---------------------------------------------------------------------------
# Forward: blocked gather


def _gather_kernel(base_ref, ranks_ref, rows0_ref, rows1_ref, out_ref):
    t = pl.program_id(0)
    base = base_ref[t] * TILE                         # element offset of window
    local = ranks_ref[...] - base                     # [T, 1], in [0, 2T) for real
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1)
    onehot = (local == iota).astype(jnp.bfloat16)     # [T, 2T]
    window = jnp.concatenate([rows0_ref[...], rows1_ref[...]], axis=0)  # [2T, D]
    out_ref[...] = jax.lax.dot_general(
        onehot,
        window,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def blocked_gather(rows, ranks_sorted, tile_base, interpret: bool = False):
    """out[i] = rows[ranks_sorted[i]] (0 where the rank falls outside the
    tile's window — only happens for padding ranks, by construction).

    rows:         [R, D], R % TILE == 0 (callers pad; last block all-zero)
    ranks_sorted: [n] int32 ascending, n % TILE == 0
    tile_base:    [n/TILE] int32, aligned window start in TILE units,
                  clamped to R/TILE - 2
    Returns [n, D] float32.
    """
    n = ranks_sorted.shape[0]
    n_tiles = n // TILE
    D = rows.shape[1]
    rows16 = rows.astype(jnp.bfloat16)
    ranks_col = ranks_sorted.reshape(n, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((TILE, D), lambda t, base: (base[t], 0)),
            pl.BlockSpec((TILE, D), lambda t, base: (base[t] + 1, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda t, base: (t, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
        interpret=interpret,
    )(tile_base, ranks_col, rows16, rows16)


# ---------------------------------------------------------------------------
# Backward: blocked scatter-add (transposed one-hot matmul).
#
# Grid = position tiles only. Tile t contributes to the two consecutive
# blocks of its window [b_t, b_t+1]. Consecutive tiles share window blocks
# (b is non-decreasing), so accumulation needs block-resident revisiting —
# but the windows OVERLAP by one block, which a single output can't
# express. Parity split fixes it: even-numbered blocks accumulate in
# output A, odd in output B; each tile touches exactly one of each, both
# with non-decreasing (thus revisit-friendly) block indices. The caller
# interleaves A and B back together.


def _scatter_kernel(base_ref, ranks_ref, g_ref, outA_ref, outB_ref, *, cdt=jnp.bfloat16):
    t = pl.program_id(0)
    b = base_ref[t]                                   # window start block
    par = b % 2
    b_even = b + par                                  # even block in window
    b_odd = b + 1 - par                               # odd block in window
    prev = base_ref[jnp.maximum(t - 1, 0)]
    prev_even = prev + (prev % 2)
    prev_odd = prev + 1 - (prev % 2)

    @pl.when((t == 0) | (b_even != prev_even))
    def _():
        outA_ref[...] = jnp.zeros_like(outA_ref)

    @pl.when((t == 0) | (b_odd != prev_odd))
    def _():
        outB_ref[...] = jnp.zeros_like(outB_ref)

    local = ranks_ref[...] - b * TILE                 # [T, 1] in [0, 2T)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * TILE), 1)
    onehot = (local == iota).astype(cdt)              # [T(pos), 2T(rank)]
    contrib = jax.lax.dot_general(
        onehot,
        g_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),   # onehot^T @ g -> [2T, D]
        preferred_element_type=jnp.float32,
    )
    lowers = contrib[:TILE]                           # block b
    uppers = contrib[TILE:]                           # block b + 1
    is_even = (par == 0)
    outA_ref[...] += jnp.where(is_even, lowers, uppers)
    outB_ref[...] += jnp.where(is_even, uppers, lowers)


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret", "exact"))
def blocked_scatter_add(
    g_sorted,
    ranks_sorted,
    tile_base,
    n_rows: int,
    interpret: bool = False,
    exact: bool = False,
):
    """grad_rows[r] = sum of g_sorted at positions with ranks_sorted==r.

    g_sorted [n, D]; ranks_sorted [n] ascending; tile_base [n/TILE] as in
    blocked_gather. n_rows must be a multiple of 2*TILE.
    """
    n = ranks_sorted.shape[0]
    n_tiles = n // TILE
    D = g_sorted.shape[1]
    n_blocks = n_rows // TILE
    assert n_blocks % 2 == 0, "n_rows must be a multiple of 2*TILE"
    cdt = jnp.float32 if exact else jnp.bfloat16
    g16 = g_sorted.astype(cdt)
    ranks_col = ranks_sorted.reshape(n, 1)

    def a_map(t, base):
        b = base[t]
        return ((b + b % 2) // 2, 0)

    def b_map(t, base):
        b = base[t]
        return ((b + 1 - b % 2 - 1) // 2, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t, base: (t, 0)),
            pl.BlockSpec((TILE, D), lambda t, base: (t, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TILE, D), a_map),
            pl.BlockSpec((TILE, D), b_map),
        ),
    )
    outA, outB = pl.pallas_call(
        functools.partial(_scatter_kernel, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows // 2, D), jnp.float32),
            jax.ShapeDtypeStruct((n_rows // 2, D), jnp.float32),
        ),
        interpret=interpret,
    )(tile_base, ranks_col, g16)

    # Untouched blocks keep whatever the backing buffer held — mask them.
    # A tile only initialises blocks it maps to; blocks no tile maps to
    # must read as zero. Build the touched-mask from tile_base on device.
    half = n_blocks // 2
    blocks_a = (tile_base + tile_base % 2) // 2            # [n_tiles]
    blocks_b = (tile_base + 1 - tile_base % 2 - 1) // 2
    touched_a = jnp.zeros((half,), jnp.bool_).at[blocks_a].set(True)
    touched_b = jnp.zeros((half,), jnp.bool_).at[blocks_b].set(True)
    outA = jnp.where(touched_a[:, None, None],
                     outA.reshape(half, TILE, D),
                     0.0)
    outB = jnp.where(touched_b[:, None, None],
                     outB.reshape(half, TILE, D),
                     0.0)
    inter = jnp.stack([outA, outB], axis=1)                # [half, 2, T, D]
    return inter.reshape(n_rows, D)


# ---------------------------------------------------------------------------
# Fine-granularity window variants: the window advances in WTILE=128-row
# blocks instead of TILE-row blocks, so a TILE-position tile reads
# n_win*128 window rows (n_win = ceil((TILE+127)/128), e.g. 5x128=640 for
# TILE=512 instead of 2x512=1024) — ~37% fewer one-hot compares and a
# smaller matmul K dimension. The scatter generalises the even/odd parity
# scheme to mod-n_win residue outputs: output j holds the blocks with
# index % n_win == j; a tile's n_win consecutive window blocks have
# distinct residues, and within a residue class the visited block index is
# non-decreasing (revisit-friendly accumulation).


WTILE = 128


def _fine_tile_base(ranks_sorted, n_rows: int, n_win: int, tile: int):
    """Per-tile window start in WTILE units, clamped so the window fits."""
    return jnp.minimum(
        ranks_sorted[::tile] // WTILE, n_rows // WTILE - n_win
    ).astype(jnp.int32)


def _gather_fine_kernel(base_ref, ranks_ref, *refs, n_win: int, tile: int,
                        cdt=jnp.bfloat16):
    rows_refs, out_ref = refs[:-1], refs[-1]
    t = pl.program_id(0)
    base = base_ref[t] * WTILE
    local = ranks_ref[...] - base                     # [T, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, n_win * WTILE), 1)
    onehot = (local == iota).astype(cdt)
    window = jnp.concatenate([r[...] for r in rows_refs], axis=0)
    out_ref[...] = jax.lax.dot_general(
        onehot, window,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit,
                   static_argnames=("n_win", "tile", "interpret", "exact"))
def blocked_gather_fine(rows, ranks_sorted, tile_base, n_win: int = 5,
                        tile: int = TILE, interpret: bool = False,
                        exact: bool = False):
    """blocked_gather with an n_win x WTILE window. tile_base is in WTILE
    units (use _fine_tile_base). Requires n_win * WTILE >= tile + WTILE - 1
    and rows.shape[0] % WTILE == 0."""
    n = ranks_sorted.shape[0]
    n_tiles = n // tile
    D = rows.shape[1]
    cdt = jnp.float32 if exact else jnp.bfloat16
    rows_c = rows.astype(cdt)

    def rows_spec(i):
        return pl.BlockSpec((WTILE, D), lambda t, base, i=i: (base[t] + i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, 1), lambda t, base: (t, 0))]
        + [rows_spec(i) for i in range(n_win)],
        out_specs=pl.BlockSpec((tile, D), lambda t, base: (t, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_fine_kernel, n_win=n_win, tile=tile,
                          cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
        interpret=interpret,
    )(tile_base, ranks_sorted.reshape(n, 1), *([rows_c] * n_win))


def _scatter_fine_kernel(base_ref, ranks_ref, g_ref, *out_refs, n_win: int,
                         tile: int, cdt=jnp.bfloat16):
    t = pl.program_id(0)
    b = base_ref[t]
    prev = base_ref[jnp.maximum(t - 1, 0)]
    local = ranks_ref[...] - b * WTILE
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, n_win * WTILE), 1)
    onehot = (local == iota).astype(cdt)
    contrib = jax.lax.dot_general(
        onehot, g_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),   # [n_win*W, D]
        preferred_element_type=jnp.float32,
    )
    for j in range(n_win):
        off_j = jnp.mod(j - b, n_win)                 # window slot of res j
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
    static_argnames=("n_rows", "n_win", "tile", "interpret", "exact"))
def blocked_scatter_add_fine(g_sorted, ranks_sorted, tile_base, n_rows: int,
                             n_win: int = 5, tile: int = TILE,
                             interpret: bool = False, exact: bool = False):
    """blocked_scatter_add with an n_win x WTILE window (mod-n_win residue
    outputs). n_rows % (n_win * WTILE) == 0; tile_base in WTILE units."""
    n = ranks_sorted.shape[0]
    n_tiles = n // tile
    D = g_sorted.shape[1]
    n_blocks = n_rows // WTILE
    assert n_blocks % n_win == 0, (
        f"n_rows={n_rows} must be a multiple of {n_win * WTILE}")
    per = n_blocks // n_win
    cdt = jnp.float32 if exact else jnp.bfloat16
    g_c = g_sorted.astype(cdt)

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
            pl.BlockSpec((tile, D), lambda t, base: (t, 0)),
        ],
        out_specs=tuple(out_spec(j) for j in range(n_win)),
    )
    outs = pl.pallas_call(
        functools.partial(_scatter_fine_kernel, n_win=n_win, tile=tile,
                          cdt=cdt),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_rows // n_win, D), jnp.float32)
            for _ in range(n_win)
        ),
        interpret=interpret,
    )(tile_base, ranks_sorted.reshape(n, 1), g_c)

    # mask untouched blocks (buffers hold garbage where no tile mapped)
    touched = jnp.zeros((n_blocks,), jnp.bool_).at[
        (tile_base[:, None] + jnp.arange(n_win)[None, :]).reshape(-1)
    ].set(True)                                        # [n_blocks]
    touched = touched.reshape(per, n_win)              # [q, residue]
    stacked = jnp.stack([o.reshape(per, WTILE, D) for o in outs], axis=1)
    stacked = jnp.where(touched[:, :, None, None], stacked, 0.0)
    return stacked.reshape(n_rows, D)


# ---------------------------------------------------------------------------
# Host-side batch planning (sorted layout + tile metadata)


def plan_sorted_layout(
    ids: np.ndarray, valid: np.ndarray, n_rows_pad: int | None = None,
    trim: bool = True, n_rows_multiple: int | None = None,
) -> dict:
    """Plan a batch for the kernels. n_rows_pad (optional): unique-space
    size, multiple of 2*TILE, >= n_unique + TILE (the trailing block stays
    all-padding); sized from the actual unique count when omitted.

    trim=True (default) truncates the sorted position arrays to the valid
    count (rounded up to TILE): the stable sort pushes every masked slot
    to the tail, so dropped positions are exactly padding — on the
    bundled CTR data this removes 27% of all kernel work (rows average
    282 nonzeros of the L=384 rectangle). Callers needing the full B*L
    position space (fixed shapes across batches) pass trim=False.

    Returns numpy arrays; convert to jnp once and reuse (for fixed batches
    this is free; for a stream, planning is O(n log n) on host — or use
    plan_batch_on_device).
    """
    flat = ids.reshape(-1).astype(np.int64)
    v = valid.reshape(-1) > 0
    n = flat.size
    assert n % TILE == 0, f"positions {n} not a multiple of {TILE}"

    sentinel = np.int64(1 << 40)
    # native C++ planner when available (csrc/plan_server.cpp — chunked
    # parallel sort, byte-identical outputs, tests/test_plan_native.py);
    # numpy stays the reference implementation and the fallback. Both
    # branches produce: perm (stable sort order, masked slots last),
    # ranks_m1 (rank per sorted position, -1 at masked slots),
    # uids_compact (ascending unique ids), n_valid.
    core = None
    try:
        from lightctr_tpu.data.native import plan_sorted_core_native

        core = plan_sorted_core_native(flat, v)
    except Exception:
        core = None
    if core is not None:
        perm, ranks_m1, uids_compact, n_valid = core
        n_unique = int(uids_compact.size)
    else:
        keyed = np.where(v, flat, sentinel)
        perm = np.argsort(keyed, kind="stable")
        sorted_ids = keyed[perm]
        is_new = np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]])
        is_new &= sorted_ids != sentinel
        ranks_m1 = np.where(sorted_ids == sentinel, -1, np.cumsum(is_new) - 1)
        n_unique = int(is_new.sum())
        uids_compact = sorted_ids[is_new]
        n_valid = int(v.sum())
    if n_rows_pad is None:
        m = 2 * TILE
        if n_rows_multiple:
            m = math.lcm(m, n_rows_multiple)  # e.g. fine windows need %640
        n_rows_pad = ((n_unique + TILE) + m - 1) // m * m
    assert n_rows_pad % (2 * TILE) == 0
    assert n_unique + TILE <= n_rows_pad, (
        f"n_rows_pad={n_rows_pad} too small for {n_unique} unique ids"
    )

    uids = np.zeros(n_rows_pad, np.int64)
    uids[:n_unique] = uids_compact  # ranks of first occurrences are 0..n_unique-1
    pad_rank = n_rows_pad - 1
    ranks_sorted = np.where(ranks_m1 < 0, pad_rank, ranks_m1).astype(np.int32)

    if trim:
        n_pos = max(((n_valid + TILE - 1) // TILE) * TILE, TILE)
        perm = perm[:n_pos]
        ranks_sorted = ranks_sorted[:n_pos]
        n = n_pos

    tile_base = (ranks_sorted[::TILE] // TILE).astype(np.int32)
    tile_base = np.minimum(tile_base, n_rows_pad // TILE - 2)

    inv = np.full(flat.size, -1, np.int64)
    inv[perm] = np.arange(n)  # dropped (masked) positions stay -1
    return {
        "perm": perm.astype(np.int32),
        "inv": inv.astype(np.int32),
        "ranks_sorted": ranks_sorted,
        "tile_base": tile_base,
        "uids": uids.astype(np.int32),
        "n_unique": n_unique,
        "pad_rank": pad_rank,
        "n_rows_pad": n_rows_pad,
    }


# ---------------------------------------------------------------------------
# Differentiable lookup over the sorted layout


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sorted_lookup(rows, ranks_sorted, tile_base,
                  n_rows: int, interpret: bool = False):
    """rows[ranks_sorted] with a Pallas forward AND backward.

    Output is in sorted position order ([n, D] f32); callers un-permute
    with plan['inv'] or keep computing in sorted order (preferred — it's
    just a relabeling of positions within the batch).
    """
    return blocked_gather(rows, ranks_sorted, tile_base, interpret)


def _fwd(rows, ranks_sorted, tile_base, n_rows, interpret):
    out = blocked_gather(rows, ranks_sorted, tile_base, interpret)
    return out, (ranks_sorted, tile_base)


def _bwd(n_rows, interpret, res, g):
    ranks_sorted, tile_base = res
    grad_rows = blocked_scatter_add(
        g, ranks_sorted, tile_base, n_rows=n_rows, interpret=interpret
    )
    return grad_rows, None, None


sorted_lookup.defvjp(_fwd, _bwd)
