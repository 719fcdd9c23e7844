"""Experiment: gather-direction kernels via VMEM dynamic indexing
(jnp.take) instead of one-hot MXU matmuls.

The staged FM step has 4 one-hot matmuls; 2 of them are GATHERS
(e = window[local], duals_pos = duals[rowid]) that a Mosaic dynamic
gather could do without MXU work at all. The 2 reduce-direction matmuls
(rowsum, scatter) stay. If take lowers well: 4 -> 2 matmuls.

    python benchmarks/bench_take_variant.py [n_steps]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TILE = 512
D = 16
S = 32


def _fwd_take_kernel(base_ref, ranks_ref, rowid_ref, xv_ref,
                     rows0_ref, rows1_ref, rowsum_ref, epos_ref,
                     *, n_k, b_pad, cdt):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        rowsum_ref[...] = jnp.zeros_like(rowsum_ref)

    base = base_ref[t] * TILE
    local = ranks_ref[...] - base                          # [T, 1]
    window = jnp.concatenate([rows0_ref[...], rows1_ref[...]], axis=0)
    idx = jnp.broadcast_to(local, (TILE, D))
    e = jnp.take_along_axis(window, idx, axis=0)           # dynamic gather
    epos_ref[...] = e

    xv = xv_ref[...]
    w = e[:, 0:1]
    v = e[:, 1:1 + n_k]
    wx = w * xv
    vx = v * xv
    vx2 = vx * vx
    pad = jnp.zeros((TILE, S - 1 - 2 * n_k), jnp.float32)
    terms = jnp.concatenate([wx, vx, vx2, pad], axis=1)

    rid = rowid_ref[...]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (TILE, b_pad), 1)
    onehot_row = (rid == iota_b).astype(cdt)
    rowsum_ref[...] += jax.lax.dot_general(
        onehot_row, terms.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("n_k", "b_pad", "exact"))
def fm_forward_take(rows, ranks_sorted, rowid_sorted, xv_sorted, tile_base,
                    n_k, b_pad, exact=True):
    n = ranks_sorted.shape[0]
    n_tiles = n // TILE
    cdt = jnp.float32 if exact else jnp.bfloat16
    rowsf = rows.astype(jnp.float32)
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
    return pl.pallas_call(
        functools.partial(_fwd_take_kernel, n_k=n_k, b_pad=b_pad, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((n, D), jnp.float32),
        ),
    )(tile_base, ranks_sorted.reshape(n, 1), rowid_sorted.reshape(n, 1),
      xv_sorted.astype(jnp.float32).reshape(n, 1), rowsf, rowsf)


def _bwd_take_kernel(rowid_ref, xv_ref, epos_ref, duals_ref, dwv_ref,
                     *, n_k):
    rid = rowid_ref[...]
    duals_pos = jnp.take_along_axis(
        duals_ref[...], jnp.broadcast_to(rid, (TILE, S)), axis=0)  # [T, S]
    dlogit = duals_pos[:, 0:1]
    a = duals_pos[:, 1:1 + n_k]
    b = duals_pos[:, 1 + n_k:1 + 2 * n_k]
    xv = xv_ref[...]
    e = epos_ref[...]
    v = e[:, 1:1 + n_k]
    dw = dlogit * xv
    dv = (a - b * v * xv) * xv
    pad = jnp.zeros((TILE, D - 1 - n_k), jnp.float32)
    dwv_ref[...] = jnp.concatenate([dw, dv, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("n_k", "b_pad"))
def fm_backward_take(rowid_sorted, xv_sorted, e_pos, duals, n_k, b_pad):
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
    return pl.pallas_call(
        functools.partial(_bwd_take_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
    )(rowid_sorted.reshape(n, 1),
      xv_sorted.astype(jnp.float32).reshape(n, 1), e_pos, duals)


def main():
    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.ops import fm_fused_pallas as K
    from lightctr_tpu.ops.embedding_pallas import blocked_scatter_add

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels
    )
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=8, learning_rate=0.05, exact=True
    )
    n_k, b_pad, R = 8, plan.b_pad, plan.n_rows_pad
    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows

    @jax.jit
    def step_take(state):
        rowsum, e_pos = fm_forward_take(
            state.rows, plan.ranks_sorted, plan.rowid_sorted,
            plan.xv_sorted, plan.tile_base, n_k=n_k, b_pad=b_pad,
        )
        wx = rowsum[:, 0]
        s = rowsum[:, 1:1 + n_k]
        ss = rowsum[:, 1 + n_k:1 + 2 * n_k]
        z = state.w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid
        duals = jnp.zeros((b_pad, S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1:1 + n_k].set(dlogit[:, None] * s)
        duals = duals.at[:, 1 + n_k:1 + 2 * n_k].set(
            jnp.broadcast_to(dlogit[:, None], (b_pad, n_k)))
        dwv = fm_backward_take(
            plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
            n_k=n_k, b_pad=b_pad)
        grad = blocked_scatter_add(
            dwv, plan.ranks_sorted, plan.tile_base, n_rows=R, exact=True)
        accum = state.accum + grad * grad
        rows = state.rows - 0.05 * grad / (jnp.sqrt(accum) + 1e-7)
        rows = rows.at[R - 1].set(0.0)
        g0 = jnp.sum(dlogit)
        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - 0.05 * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return state._replace(w0=w0, w0_accum=w0_accum, rows=rows,
                              accum=accum), loss

    state = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    try:
        state, loss = step_take(state)
        print(f"take-variant warmup loss={float(loss):.5f}")
    except Exception as e:  # noqa: BLE001
        print(f"take-variant FAILED to compile: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step_take(state)
    final = float(loss)
    dt = (time.perf_counter() - t0) / n_steps
    print(f"take-variant: {dt*1e3:.3f} ms/step, {B/dt:,.0f} ex/s, "
          f"loss={final:.5f}  (staged onehot exact: 3.79 ms)")


if __name__ == "__main__":
    main()
