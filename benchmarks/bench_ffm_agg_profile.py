"""Decompose the count-matrix FFM step (cfg.agg) on real TPU.

The full agg step measured 23.2 ms bf16 / 26.0 ms fp32 (PARITY.md) vs a
~5-7 ms MXU+HBM roofline for its two [B*F, R] x [R, Dw] matmuls. This
script isolates where the rest goes, scan-amortised like the product
path:

  step_ingraph   the product step (C built in-graph; XLA should hoist
                 the loop-invariant build out of the scan)
  step_carg      identical step but C precomputed ONCE and passed as a
                 jit argument (no in-graph build at all). If this is
                 faster, hoisting is NOT happening and the per-step
                 rebuild (zero-init of [B*F, R] + 384k scalar scatter)
                 is real per-step cost.
  fwd_only       value(loss) without grad/update — the forward half.
  matmul_only    just S = C @ table with table as the scan carry — the
                 irreducible main matmul.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_agg_profile.py
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
    n_valid = plan.n_valid_rows
    cdt = jnp.bfloat16
    n_steps = 100
    out = {"R": R, "BF": int(plan.labels.shape[0]) * cfg.n_fields,
           "Dw": cfg.row_width}

    def timed(run, s0, label, consume):
        o = run(s0)
        consume(o)
        t0 = time.perf_counter()
        o = run(s0)
        consume(o)
        out[label] = round((time.perf_counter() - t0) / n_steps * 1e3, 2)
        print(json.dumps(out), flush=True)

    # ---- step_ingraph: the product step under make_multi_step
    from lightctr_tpu.models.fm_kernel import make_multi_step

    step = ffm_kernel.make_train_step(cfg, plan)
    run = make_multi_step(step, n_steps)
    timed(run, state, "step_ingraph_ms",
          lambda o: float(o[1][-1]))

    # ---- step_carg: C passed in as a jit argument (built once, eager)
    C0 = ffm_kernel.count_matrix(plan.ranks, plan.fields, plan.xv, R,
                                 cfg.n_fields, cdt)

    def loss_from_C(table, w0, C):
        z = ffm_kernel._logits_from_counts(table, w0, C, plan.ranks,
                                           plan.fields, plan.xv, cfg)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    @jax.jit
    def run_carg(state, C):
        def body(s, _):
            loss, (g_t, g_w0) = jax.value_and_grad(
                loss_from_C, argnums=(0, 1))(s.table, s.w0, C)
            g_t = g_t + cfg.l2 * s.table
            accum = s.accum + g_t * g_t
            table = (s.table - cfg.learning_rate * g_t
                     / (jnp.sqrt(accum) + 1e-7)).at[R - 1].set(0.0)
            w0_accum = s.w0_accum + g_w0 * g_w0
            w0 = s.w0 - cfg.learning_rate * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
            return ffm_kernel.KernelFFMState(w0, w0_accum, table, accum), loss
        return jax.lax.scan(body, state, None, length=n_steps)

    timed(lambda s: run_carg(s, C0), state, "step_carg_ms",
          lambda o: float(o[1][-1]))

    # ---- fwd_only: loss chained through a scalar carry (C as a jit ARG —
    # a closure would serialize it into the HLO, HTTP 413)
    @jax.jit
    def run_fwd(state, C):
        def body(acc, _):
            # acc feeds w0 with a tiny real perturbation so XLA cannot
            # hoist the whole loss out of the loop
            l = loss_from_C(state.table, state.w0 + acc * 1e-20, C)
            return acc + l, l
        return jax.lax.scan(body, jnp.zeros(()), None, length=n_steps)

    timed(lambda s: run_fwd(s, C0), state, "fwd_only_ms",
          lambda o: float(o[0]))

    # ---- matmul_only: S = C @ table, table perturbed via carry
    @jax.jit
    def run_mm(state, C):
        def body(t, _):
            S = jnp.einsum("pr,rd->pd", C, t.astype(cdt),
                           preferred_element_type=jnp.float32)
            return t + 1e-12 * jnp.sum(S), jnp.sum(S[0])
        return jax.lax.scan(body, state.table, None, length=n_steps)

    timed(lambda s: run_mm(s, C0), state, "matmul_only_ms",
          lambda o: float(o[1][-1]))

    # ---- backward-shape matmul: dtable = einsum('pr,pd->rd', C, dS) —
    # contracts the MAJOR dim of C; if XLA relayouts/transposes C for the
    # MXU this measures slower than matmul_only and a precomputed C^T
    # const would pay off in the product step
    BF = plan.labels.shape[0] * cfg.n_fields
    dS0 = jnp.ones((BF, cfg.row_width), jnp.float32) * 1e-3

    @jax.jit
    def run_mm_t(dS, C):
        def body(d, _):
            g = jnp.einsum("pr,pd->rd", C, d.astype(cdt),
                           preferred_element_type=jnp.float32)
            return d + 1e-12 * jnp.sum(g), jnp.sum(g[0])
        return jax.lax.scan(body, dS, None, length=n_steps)

    timed(lambda s: run_mm_t(dS0, C0), state, "matmul_T_only_ms",
          lambda o: float(o[1][-1]))

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
