"""Measure fine-granularity (WTILE=128) gather/scatter windows vs the
TILE-granular baseline on the headline bench workload (full-batch FM k=8,
train_sparse.csv, trimmed plan).

Variants:
  baseline  fm_forward + fm_backward_positions + blocked_scatter_add
            (2 x 512-row windows, 512-position tiles)
  fine5     window 5 x 128 = 640 rows, 512-position tiles (37% fewer
            one-hot compares/MACs than 1024-row windows)
  fine3     window 3 x 128 = 384 rows, 256-position tiles (fewer compares
            still, but 2x the grid steps and half-height matmuls)

All exact (fp32) mode — the headline path. Timing: chained state + scalar
readback (block_until_ready does not sync on this transport).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from lightctr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from lightctr_tpu.data import load_libffm
from lightctr_tpu.models import fm_kernel
from lightctr_tpu.ops import embedding_pallas as E
from lightctr_tpu.ops import fm_fused_pallas as K

N_STEPS = 300


def time_steps(step, state, n=N_STEPS):
    state2, loss = step(state)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        state2, loss = step(state2)
    final = float(loss)
    dt = (time.perf_counter() - t0) / n
    return dt, final


def losses5(step, state):
    out = []
    for _ in range(5):
        state, loss = step(state)
        out.append(float(loss))
    return out


def make_fine_step(cfg, plan, n_win, tile):
    n_k = cfg.factor
    b_pad = plan.b_pad
    R = plan.n_rows_pad
    B = plan.labels.shape[0]
    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows
    tbf = E._fine_tile_base(plan.ranks_sorted, R, n_win, tile)

    @jax.jit
    def step(state):
        rowsum, e_pos = K.fm_forward_fine(
            state.rows, plan.ranks_sorted, plan.rowid_sorted,
            plan.xv_sorted, tbf, n_k=n_k, b_pad=b_pad, n_win=n_win,
            tile=tile, exact=True,
        )
        wx = rowsum[:, 0]
        s = rowsum[:, 1:1 + n_k]
        ss = rowsum[:, 1 + n_k:1 + 2 * n_k]
        z = state.w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(jnp.exp(-jnp.abs(z)))
        loss = jnp.sum(per * rmask_p) / n_valid
        dlogit = (jax.nn.sigmoid(z) - labels_p) * rmask_p / n_valid
        duals = jnp.zeros((b_pad, K.S))
        duals = duals.at[:, 0].set(dlogit)
        duals = duals.at[:, 1:1 + n_k].set(dlogit[:, None] * s)
        duals = duals.at[:, 1 + n_k:1 + 2 * n_k].set(
            jnp.broadcast_to(dlogit[:, None], (b_pad, n_k)))
        dwv_pos = K.fm_backward_positions(
            plan.rowid_sorted, plan.xv_sorted, e_pos, duals,
            n_k=n_k, b_pad=b_pad, exact=True,
        )
        grad_rows = E.blocked_scatter_add_fine(
            dwv_pos, plan.ranks_sorted, tbf, n_rows=R, n_win=n_win,
            tile=tile, exact=True,
        )
        accum = state.accum + grad_rows * grad_rows
        rows = state.rows - cfg.learning_rate * grad_rows / (
            jnp.sqrt(accum) + 1e-7)
        rows = rows.at[R - 1].set(0.0)
        g0 = jnp.sum(dlogit)
        w0_accum = state.w0_accum + g0 * g0
        w0 = state.w0 - cfg.learning_rate * g0 / (jnp.sqrt(w0_accum) + 1e-7)
        return fm_kernel.KernelFMState(
            w0, w0_accum, rows, accum, state.ftrl_z, state.ftrl_n), loss

    return step


def main():
    ds = load_libffm("/root/reference/data/train_sparse.csv")
    ids = ds.ids.astype(np.int64)

    results = {}

    # -- baseline (compiled from cache)
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=8, learning_rate=0.05)
    plan = fm_kernel.plan_batch(ids, ds.vals, ds.mask, ds.labels)
    state = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = fm_kernel.make_train_step(cfg, plan)
    dt, _ = time_steps(step, state)
    base_losses = losses5(step, state)
    results["baseline"] = dt
    print(f"baseline (R={plan.n_rows_pad}): {dt*1e3:.3f} ms "
          f"losses={['%.6f' % l for l in base_losses]}", flush=True)

    for name, n_win, tile, R in (
        ("fine5", 5, 512, 10240),   # lcm(1024, 640)
        ("fine3", 3, 256, None),    # 9216 % 384 == 0 already
    ):
        t0 = time.perf_counter()
        plan_f = fm_kernel.plan_batch(ids, ds.vals, ds.mask, ds.labels,
                                      n_rows_pad=R, trim=True)
        state_f = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan_f)
        step_f = make_fine_step(cfg, plan_f, n_win, tile)
        losses = losses5(step_f, state_f)
        print(f"{name}: compiled+5 steps in {time.perf_counter()-t0:.1f}s "
              f"losses={['%.6f' % l for l in losses]}", flush=True)
        drift = max(abs(a - b) for a, b in zip(losses, base_losses))
        dt, _ = time_steps(step_f, state_f)
        results[name] = dt
        print(f"{name} (R={plan_f.n_rows_pad}): {dt*1e3:.3f} ms "
              f"(x{results['baseline']/dt:.3f} vs baseline, "
              f"loss drift {drift:.2e})", flush=True)

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
