"""Self-term design shootout for the count-matrix FFM step.

The rank-field rewrite (models/ffm_kernel._logits_from_counts_rf) cut
the step from 12.85 to 8.24 ms, but vs the no-self ablation floor
(6.39 ms, benchmarks/bench_ffm_ablate.py) the self-term still costs
~1.85 ms. Candidates measured here, all numerics-checked against the
committed rf path first:

  rf       committed path (gather v_own = V[arange, rank_field] ->
           d2r -> Crow2 @ d2r matvec; backward = scatter + matvec)
  onehot   d2r = sum(D2 * onehot_rf, axis=1) with onehot_rf a plan
           constant [R, F] — no gather, no backward scatter, all
           elementwise
  fold     d2r written into an unused pad column of the table copy and
           Crow2 appended as B extra rows of the plan-constant count
           matrix: the self-term rides the MAIN MXU matmul
           (S_all = [C; Crow2] @ T2, +B/(B*F) ~ 1.5% FLOPs), and its
           backward rides the same C_all^T contraction

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_self_variants.py
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
    assert plan.rank_field is not None
    state0 = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    R = plan.n_rows_pad
    B = plan.labels.shape[0]
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    FK = F * Kf
    assert 1 + FK < Dw, "fold variant needs a spare pad column"
    self_col = 1 + FK
    n_valid = plan.n_valid_rows
    cdt = jnp.bfloat16
    n_steps = 100
    rf = jnp.asarray(plan.rank_field)
    onehot_rf = jnp.asarray(
        np.eye(F, dtype=np.float32)[plan.rank_field]
    )  # [R, F] plan constant
    C = ffm_kernel.count_matrix(plan.ranks, plan.fields, plan.xv, R,
                                cfg.n_fields, cdt)
    Crow2 = ffm_kernel.count_matrix_rows(plan.ranks, plan.xv * plan.xv,
                                         R, cdt)
    C_all = jnp.concatenate([C, Crow2], axis=0)   # [(B*F)+B, R] plan const
    out = {}

    def pair_terms(S):
        wx = jnp.sum(S[..., 0], axis=-1)
        P = S[..., 1 : 1 + FK].reshape(B, F, F, Kf)
        Pc = P.astype(cdt)
        total = jnp.einsum("bfgk,bgfk->b", Pc, Pc,
                           preferred_element_type=jnp.float32)
        return wx, total

    def loss_rf(table, w0, consts):
        z = ffm_kernel._logits_from_counts_rf(table, w0, consts[0],
                                              consts[1], rf, cfg)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    def loss_onehot(table, w0, consts):
        C, Crow2 = consts
        S = jnp.einsum("pr,rd->pd", C, table.astype(cdt),
                       preferred_element_type=jnp.float32).reshape(B, F, Dw)
        wx, total = pair_terms(S)
        V = table[:, 1 : 1 + FK].reshape(-1, F, Kf)
        D2 = jnp.sum(V * V, axis=-1)              # [R, F]
        d2r = jnp.sum(D2 * onehot_rf, axis=1)     # [R], no gather
        self_t = jnp.einsum("br,r->b", Crow2, d2r.astype(cdt),
                            preferred_element_type=jnp.float32)
        z = w0 + wx + 0.5 * (total - self_t)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    def loss_fold(table, w0, consts):
        (C_all,) = consts
        V = table[:, 1 : 1 + FK].reshape(-1, F, Kf)
        v_own = V[jnp.arange(R), rf]
        d2r = jnp.sum(v_own * v_own, axis=-1)     # [R]
        T2 = table.astype(cdt).at[:, self_col].set(d2r.astype(cdt))
        S_all = jnp.einsum("pr,rd->pd", C_all, T2,
                           preferred_element_type=jnp.float32)
        S = S_all[: B * F].reshape(B, F, Dw)
        wx, total = pair_terms(S)
        self_t = S_all[B * F :, self_col]         # [B] — free column read
        z = w0 + wx + 0.5 * (total - self_t)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    def loss_fold_oh(table, w0, consts):
        (C_all,) = consts
        V = table[:, 1 : 1 + FK].reshape(-1, F, Kf)
        D2 = jnp.sum(V * V, axis=-1)
        d2r = jnp.sum(D2 * onehot_rf, axis=1)
        T2 = table.astype(cdt).at[:, self_col].set(d2r.astype(cdt))
        S_all = jnp.einsum("pr,rd->pd", C_all, T2,
                           preferred_element_type=jnp.float32)
        S = S_all[: B * F].reshape(B, F, Dw)
        wx, total = pair_terms(S)
        self_t = S_all[B * F :, self_col]
        z = w0 + wx + 0.5 * (total - self_t)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    variants = {
        "rf": (loss_rf, (C, Crow2)),
        "onehot": (loss_onehot, (C, Crow2)),
        "fold": (loss_fold, (C_all,)),
        "fold_oh": (loss_fold_oh, (C_all,)),
    }

    def make_run(loss_fn):
        @jax.jit
        def run(state, consts):
            def body(s, _):
                loss, (g_t, g_w0) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(s.table, s.w0, consts)
                g_t = g_t + cfg.l2 * s.table
                accum = s.accum + g_t * g_t
                table = (s.table - cfg.learning_rate * g_t
                         / (jnp.sqrt(accum) + 1e-7))
                table = table.at[R - 1].set(0.0)
                w0_accum = s.w0_accum + g_w0 * g_w0
                w0 = s.w0 - cfg.learning_rate * g_w0 / (jnp.sqrt(w0_accum)
                                                        + 1e-7)
                return ffm_kernel.KernelFFMState(w0, w0_accum, table,
                                                 accum), loss
            return jax.lax.scan(body, state, None, length=n_steps)

        return run

    losses_ref = None
    for label, (loss_fn, consts) in variants.items():
        run = make_run(loss_fn)
        o = run(state0, consts)
        losses = np.asarray(o[1][:5], np.float64)
        if losses_ref is None:
            losses_ref = losses
        else:
            np.testing.assert_allclose(losses, losses_ref, rtol=5e-3)
        float(o[1][-1])
        t0 = time.perf_counter()
        o = run(state0, consts)
        final = float(o[1][-1])
        out[f"{label}_ms"] = round((time.perf_counter() - t0) / n_steps * 1e3,
                                   2)
        out[f"{label}_final"] = round(final, 5)
        print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
