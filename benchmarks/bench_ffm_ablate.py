"""Ablate the count-matrix FFM step to locate the ~7 ms of non-matmul
residual (full step 12.9 ms = 2 x 2.8 ms main matmuls + residual —
benchmarks/bench_ffm_agg_profile.py). Each variant zeroes one component
(numerics intentionally wrong — timing only), scan-amortised with C as a
jit argument:

  full        the real loss (reference for this script)
  no_self     self-term (D2 gather over 384k positions + its backward
              scatter + dV chain) removed
  no_pair     pairwise bfgk,bgfk einsum removed
  no_opt      Adagrad update replaced by plain SGD on the dense table

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_ablate.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import ffm_kernel

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=ds.n_features, n_fields=ds.n_fields, factor=4,
        learning_rate=0.05, l2=1e-4, exact=False, agg=True,
    )
    plan = ffm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels
    )
    state = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    R = plan.n_rows_pad
    B = plan.labels.shape[0]
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    n_valid = plan.n_valid_rows
    cdt = jnp.bfloat16
    n_steps = 100
    C0 = ffm_kernel.count_matrix(plan.ranks, plan.fields, plan.xv, R,
                                 cfg.n_fields, cdt)
    out = {}

    def make_run(with_self, with_pair, adagrad):
        def loss_fn(table, w0, C):
            S = jnp.einsum("pr,rd->pd", C, table.astype(cdt),
                           preferred_element_type=jnp.float32)
            S = S.reshape(B, F, Dw)
            wx = jnp.sum(S[..., 0], axis=-1)
            z = w0 + wx
            if with_pair:
                P = S[..., 1 : 1 + F * Kf].reshape(B, F, F, Kf)
                Pc = P.astype(cdt)
                z = z + 0.5 * jnp.einsum("bfgk,bgfk->b", Pc, Pc,
                                         preferred_element_type=jnp.float32)
            if with_self:
                V = table[:, 1 : 1 + F * Kf].reshape(-1, F, Kf)
                D2 = jnp.sum(V * V, axis=-1)
                d2own = D2[plan.ranks[: B * plan.xv.shape[1]],
                           plan.fields.reshape(-1)].reshape(B, -1)
                z = z - 0.5 * jnp.sum(plan.xv * plan.xv * d2own, axis=-1)
            per = (jnp.maximum(z, 0) - z * plan.labels
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
            return jnp.sum(per * plan.row_mask) / n_valid

        @jax.jit
        def run(state, C):
            def body(s, _):
                loss, (g_t, g_w0) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(s.table, s.w0, C)
                g_t = g_t + cfg.l2 * s.table
                if adagrad:
                    accum = s.accum + g_t * g_t
                    table = (s.table - cfg.learning_rate * g_t
                             / (jnp.sqrt(accum) + 1e-7))
                else:
                    accum = s.accum
                    table = s.table - cfg.learning_rate * g_t
                table = table.at[R - 1].set(0.0)
                w0_accum = s.w0_accum + g_w0 * g_w0
                w0 = s.w0 - cfg.learning_rate * g_w0 / (jnp.sqrt(w0_accum)
                                                        + 1e-7)
                return ffm_kernel.KernelFFMState(w0, w0_accum, table,
                                                 accum), loss
            return jax.lax.scan(body, state, None, length=n_steps)

        return run

    for label, kw in (
        ("full", dict(with_self=True, with_pair=True, adagrad=True)),
        ("no_self", dict(with_self=False, with_pair=True, adagrad=True)),
        ("no_pair", dict(with_self=True, with_pair=False, adagrad=True)),
        ("no_opt", dict(with_self=True, with_pair=True, adagrad=False)),
    ):
        run = make_run(**kw)
        o = run(state, C0)
        float(o[1][-1])
        t0 = time.perf_counter()
        o = run(state, C0)
        float(o[1][-1])
        out[f"{label}_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3,
                                   2)
        print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
