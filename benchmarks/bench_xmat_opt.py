"""Attack the headline xmat step's diagnosed residual (VERDICT r2 #8).

PARITY.md's xmat analysis: the 0.13 ms scan-amortised step exceeds the
4-pass HBM roofline (count matrices stay VMEM-resident), leaving
"narrow-matmul (D=17) MXU efficiency + the [R, 17] optimizer VPU work"
as the residual bound. This probe sizes and attacks the optimizer term:

  baseline   — the shipped xmat step (Adagrad elementwise on [R, 16],
               lane utilisation 16/128 = 12.5%)
  packed_opt — same math, the elementwise update computed in a
               [R*16/128, 128] view (full lanes, 8x fewer VPU ops;
               reshapes are free relayouts of a row-major buffer)
  sgd        — plain rows - lr*grad (no accum state): bounds what any
               Adagrad optimisation could save

500-step lax.scan per dispatch, best of 3, readback-forced (bench.py's
measurement discipline).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_xmat_opt.py
"""

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.models.fm_kernel import (
        KernelFMState,
        count_matrices,
        make_multi_step,
    )
    from lightctr_tpu.ops import fm_fused_pallas as K

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=8, learning_rate=0.05,
        exact=True, xmat=True)
    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels)
    R, b_pad = plan.n_rows_pad, plan.b_pad
    n_k = cfg.factor
    labels_p = jnp.zeros((b_pad,)).at[:B].set(plan.labels)
    rmask_p = jnp.zeros((b_pad,)).at[:B].set(plan.row_mask)
    n_valid = plan.n_valid_rows
    Crow, Crow2 = count_matrices(plan)

    def loss_fn(rows, w0):
        V = rows[:, 1 : 1 + n_k]
        s_aug = jnp.einsum("br,rk->bk", Crow, rows[:, : 1 + n_k],
                           preferred_element_type=jnp.float32)
        wx, s = s_aug[:, 0], s_aug[:, 1:]
        ss = jnp.einsum("br,rk->bk", Crow2, V * V,
                        preferred_element_type=jnp.float32)
        z = w0 + wx + 0.5 * jnp.sum(s * s - ss, axis=-1)
        per = jnp.maximum(z, 0) - z * labels_p + jnp.log1p(
            jnp.exp(-jnp.abs(z)))
        return jnp.sum(per * rmask_p) / n_valid

    lr = cfg.learning_rate

    def make_step(update):
        def step(state, hyper=None):
            loss, (g, g0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                state.rows, state.w0)
            rows, accum = update(state.rows, state.accum, g)
            rows = rows.at[R - 1].set(0.0)
            w0_accum = state.w0_accum + g0 * g0
            w0 = state.w0 - lr * g0 / (jnp.sqrt(w0_accum) + 1e-7)
            return KernelFMState(w0, w0_accum, rows, accum,
                                 state.ftrl_z, state.ftrl_n), loss
        return jax.jit(step)

    def adagrad_flat(rows, accum, g):
        accum = accum + g * g
        return rows - lr * g / (jnp.sqrt(accum) + 1e-7), accum

    def adagrad_packed(rows, accum, g):
        shp = rows.shape
        r = rows.reshape(-1, 128)
        a = accum.reshape(-1, 128)
        gg = g.reshape(-1, 128)
        a = a + gg * gg
        r = r - lr * gg / (jnp.sqrt(a) + 1e-7)
        return r.reshape(shp), a.reshape(shp)

    def sgd(rows, accum, g):
        return rows - lr * g, accum

    out = {"R": int(R), "b_pad": int(b_pad)}
    state0 = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)

    for name, upd in (("baseline", adagrad_flat),
                      ("packed_opt", adagrad_packed),
                      ("sgd", sgd)):
        step = make_step(upd)
        run = make_multi_step(step, 500)
        best = None
        for _ in range(3):
            state = state0
            state, losses = run(state)
            float(losses[-1])
            t0 = time.perf_counter()
            state, losses = run(state)
            float(losses[-1])
            dt = (time.perf_counter() - t0) / 500 * 1e3
            best = dt if best is None else min(best, dt)
        out[f"{name}_step_ms"] = round(best, 4)
        print(name, out[f"{name}_step_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
