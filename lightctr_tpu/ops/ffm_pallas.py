"""Pallas TPU kernels for FFM: dense (full-sweep) one-hot gather and
scatter-add over a rank-space table, positions in NATURAL row-major order.

FFM's per-position payload is the whole field-indexed factor block
V[id] in [F, K] plus the wide w — Dw = 1 + F*K columns, far wider than
FM's packed 16. The sorted-window kernels (ops/embedding_pallas.py)
require rank-sorted positions, and un-permuting their output back to the
row/field structure the pairwise term needs would cost a full [n, Dw]
permutation gather (measured ~1.7 ns/element on v5e — tens of ms at FFM
widths). These kernels instead sweep the WHOLE rank table per position
tile (grid = position-tiles x rank-blocks), so positions never leave
[B, L] row-major order, no host/device sort is needed at all, and the
XLA einsum glue downstream sees intact rows.

Cost is O(n_positions * R * Dw) MXU MACs, linear in the unique-id count
R — the right trade in FFM's regime (full-batch training on CTR data
dedups 233k vocab to ~8.2k uniques; 68k positions x 8.7k ranks x 384
cols ≈ 229 GMAC ≈ ~1-2 ms of bf16 MXU on v5e). For huge-R streaming
regimes prefer the FM-family sorted-window kernels.

Capability lineage: the FFM trainer's hot pairwise path
(/root/reference/LightCTR/train/train_ffm_algo.cpp:51-116) — the per-pair
scalar loop `dot(V[f1,field2], V[f2,field1])*x1*x2` becomes one-hot MXU
matmuls plus batched einsums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 512   # positions per tile
RBLK = 512   # table rows per block


def _gather_kernel(ranks_ref, table_ref, out_ref, *, cdt):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = r * RBLK
    local = ranks_ref[...] - base                       # [T, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, RBLK), 1)
    onehot = (local == iota).astype(cdt)                # [T, RBLK]
    out_ref[...] += jax.lax.dot_general(
        onehot, table_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def dense_rank_gather(table, ranks, interpret: bool = False,
                      exact: bool = False):
    """out[p] = table[ranks[p]] for ARBITRARY-order ranks.

    table: [R, Dw] (R % RBLK == 0, Dw % 128 == 0)
    ranks: [n] int32 in [0, R), n % TILE == 0
    Returns [n, Dw] float32.
    """
    n = ranks.shape[0]
    R, Dw = table.shape
    assert n % TILE == 0 and R % RBLK == 0, (n, R)
    cdt = jnp.float32 if exact else jnp.bfloat16
    grid_spec = pl.GridSpec(
        grid=(n // TILE, R // RBLK),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t, r: (t, 0)),
            pl.BlockSpec((RBLK, Dw), lambda t, r: (r, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, Dw), lambda t, r: (t, 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, Dw), jnp.float32),
        interpret=interpret,
    )(ranks.reshape(n, 1), table.astype(cdt))


def _scatter_kernel(ranks_ref, g_ref, out_ref, *, cdt):
    r = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = r * RBLK
    local = ranks_ref[...] - base                       # [T, 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, RBLK), 1)
    onehot = (local == iota).astype(cdt)                # [T(pos), RBLK(rank)]
    out_ref[...] += jax.lax.dot_general(
        onehot, g_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),     # onehot^T @ g
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret", "exact"))
def dense_rank_scatter_add(g, ranks, n_rows: int, interpret: bool = False,
                           exact: bool = False):
    """out[r] = sum of g at positions with ranks == r (any order).

    g: [n, Dw]; ranks: [n] int32; n_rows % RBLK == 0. Returns [R, Dw] f32.
    """
    n, Dw = g.shape
    assert n % TILE == 0 and n_rows % RBLK == 0, (n, n_rows)
    cdt = jnp.float32 if exact else jnp.bfloat16
    grid_spec = pl.GridSpec(
        grid=(n_rows // RBLK, n // TILE),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda r, t: (t, 0)),
            pl.BlockSpec((TILE, Dw), lambda r, t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((RBLK, Dw), lambda r, t: (r, 0)),
    )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, Dw), jnp.float32),
        interpret=interpret,
    )(ranks.reshape(n, 1), g.astype(cdt))


# ---------------------------------------------------------------------------
# Differentiable lookup (gather fwd, scatter-add bwd — exact adjoints)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rank_lookup(table, ranks, interpret: bool = False, exact: bool = False):
    """table[ranks] with Pallas forward AND backward; order-free."""
    return dense_rank_gather(table, ranks, interpret, exact)


def _fwd(table, ranks, interpret, exact):
    out = dense_rank_gather(table, ranks, interpret, exact)
    return out, (ranks, table.shape[0])


def _bwd(interpret, exact, res, g):
    ranks, n_rows = res
    grad = dense_rank_scatter_add(g, ranks, n_rows, interpret, exact)
    return grad, None


rank_lookup.defvjp(_fwd, _bwd)
