"""Ablate the field-blocked FFM step (6.2 ms exact / 5.2 bf16 — only
~4-19% under the flat agg step despite 7.2x fewer matmul MACs). Each
variant zeroes one component (timing only):

  full       the real blocked loss
  no_self    self-term (v_own eye-einsum + Crow2 matvec) removed
  no_pair    pairwise bfgk,bgfk einsum removed
  sgd        Adagrad replaced by plain SGD (costs the 2nd state array)
  mm_only    z = w0 + wx only (S einsum + its backward + optimizer)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_blocked_ablate.py
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
    bplan = ffm_kernel.plan_batch_blocked(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels,
        n_fields=ds.n_fields,
    )
    state0 = ffm_kernel.init_blocked(jax.random.PRNGKey(0), cfg, bplan)
    B = bplan.labels.shape[0]
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    FK = F * Kf
    r_max = bplan.r_max
    n_valid = bplan.n_valid_rows
    cdt = jnp.bfloat16
    n_steps = 100
    C_blk = ffm_kernel.count_matrix_blocked(bplan, bplan.xv, cdt)
    Crow2_blk = ffm_kernel.count_matrix_blocked(bplan,
                                                bplan.xv * bplan.xv, cdt)
    out = {}

    def make_run(with_self, with_pair, adagrad):
        def loss_fn(table, w0, consts):
            C_blk, Crow2_blk = consts
            T = table.reshape(F, r_max, Dw)
            S = jnp.einsum("bfr,frd->bfd", C_blk, T.astype(cdt),
                           preferred_element_type=jnp.float32)
            wx = jnp.sum(S[..., 0], axis=-1)
            z = w0 + wx
            if with_pair:
                P = S[..., 1 : 1 + FK].reshape(B, F, F, Kf).astype(cdt)
                z = z + 0.5 * jnp.einsum("bfgk,bgfk->b", P, P,
                                         preferred_element_type=jnp.float32)
            if with_self:
                V4 = T[:, :, 1 : 1 + FK].reshape(F, r_max, F, Kf)
                eye = jnp.eye(F, dtype=V4.dtype)
                v_own = jnp.einsum("figk,fg->fik", V4, eye)
                d2r = jnp.sum(v_own * v_own, axis=-1)
                z = z - 0.5 * jnp.einsum("bfi,fi->b", Crow2_blk,
                                         d2r.astype(cdt),
                                         preferred_element_type=jnp.float32)
            per = (jnp.maximum(z, 0) - z * bplan.labels
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
            return jnp.sum(per * bplan.row_mask) / n_valid

        @jax.jit
        def run(state, consts):
            def body(s, _):
                loss, (g_t, g_w0) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(s.table, s.w0, consts)
                g_t = g_t + cfg.l2 * s.table
                if adagrad:
                    accum = s.accum + g_t * g_t
                    table = (s.table - cfg.learning_rate * g_t
                             / (jnp.sqrt(accum) + 1e-7))
                else:
                    accum = s.accum
                    table = s.table - cfg.learning_rate * g_t
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
        ("sgd", dict(with_self=True, with_pair=True, adagrad=False)),
        ("mm_only", dict(with_self=False, with_pair=False, adagrad=True)),
    ):
        run = make_run(**kw)
        o = run(state0, (C_blk, Crow2_blk))
        float(o[1][-1])
        t0 = time.perf_counter()
        o = run(state0, (C_blk, Crow2_blk))
        float(o[1][-1])
        out[f"{label}_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3,
                                   2)
        print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
