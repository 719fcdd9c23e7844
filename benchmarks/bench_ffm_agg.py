"""Count-matrix FFM engine (cfg.agg) vs the one-hot sweep, real TPU.

The sweep's cost floor is the rank_lookup gather + scatter vjp:
2*n*R*Dw MACs = 2 x 384k x 8704 x 384 ~ 26 ms of v5e bf16 MXU
(PARITY.md cost analysis, measured total 43.6 ms). The agg engine
pre-aggregates the n positions into C[(row, field), rank] with one
scalar scatter-add, then every contraction is (B*F) x R x Dw — with
B*F = 68k vs n = 384k, ~5.6x fewer MACs, and the backward C^T @ dS
matches. Also times the fine-window NFM step (cfg.fine) vs coarse.

    python benchmarks/bench_ffm_agg.py [n_steps]
"""

import sys
import time

import numpy as np


def _time_chain(step, state, n_steps):
    """Scan-amortised timing (all steps in ONE dispatch — sub-ms steps are
    dispatch-bound over the tunnel, see PARITY.md)."""
    from lightctr_tpu.models.fm_kernel import make_multi_step

    run = make_multi_step(step, n_steps)
    _, losses = run(state)
    warm = float(losses[0])
    t0 = time.perf_counter()
    _, losses = run(state)
    final = float(losses[-1])   # forces the device work
    dt = (time.perf_counter() - t0) / n_steps
    return dt, warm, final


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import ffm_kernel, fm_kernel, nfm_kernel

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    print(f"rows={B} n_features={ds.n_features} n_fields={ds.n_fields} "
          f"L={ds.ids.shape[1]}", flush=True)

    # ---- FFM: sweep vs agg, both compute modes
    for agg in (True, False):
        for exact in (False, True):
            cfg = ffm_kernel.KernelFFMConfig(
                n_features=ds.n_features, n_fields=ds.n_fields, factor=4,
                learning_rate=0.05, l2=1e-4, exact=exact, agg=agg,
            )
            plan = ffm_kernel.plan_batch(
                ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields,
                ds.labels
            )
            state = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
            step = ffm_kernel.make_train_step(cfg, plan)
            dt, warm, final = _time_chain(step, state, n_steps)
            print(f"ffm agg={agg} exact={exact}: {dt*1e3:.2f} ms/step, "
                  f"{B/dt:,.0f} ex/s, warm={warm:.5f} final={final:.5f}",
                  flush=True)

    # ---- NFM: fine vs coarse full-batch kernel step
    for fine in (True, False):
        cfg = nfm_kernel.KernelNFMConfig(
            n_features=ds.n_features, factor=8, hidden=(32,),
            learning_rate=0.05, exact=True, fine=fine,
        )
        plan = fm_kernel.plan_batch(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels, fine=fine
        )
        state = nfm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = nfm_kernel.make_train_step(cfg, plan)
        dt, warm, final = _time_chain(step, state, n_steps)
        print(f"nfm fine={fine}: {dt*1e3:.2f} ms/step, {B/dt:,.0f} ex/s, "
              f"warm={warm:.5f} final={final:.5f}", flush=True)


if __name__ == "__main__":
    main()
