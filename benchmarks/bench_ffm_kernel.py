"""Kernel-FFM timing + quality on the bundled CTR data (real TPU).

Reference regime (train_ffm_algo.cpp: full-batch per epoch, k=4; measured
ground truth in PARITY.md: 100 epochs in 64.69 s => 1546 examples/s;
5-epoch quality test AUC 0.478, logloss 1.82/row).

Times the fused step with readback chaining (block_until_ready does not
synchronise on this transport) in both compute modes, then trains 5 epochs
and scores the exported params with the dense scorer for quality parity.

    python benchmarks/bench_ffm_kernel.py [n_steps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import ffm, ffm_kernel
    from lightctr_tpu.serve.scorer import batch_score

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    print(f"rows={B} n_features={ds.n_features} n_fields={ds.n_fields} "
          f"L={ds.ids.shape[1]}")

    results = {}
    for exact in (False, True):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=ds.n_features, n_fields=ds.n_fields, factor=4,
            learning_rate=0.05, l2=1e-4, exact=exact,
        )
        plan = ffm_kernel.plan_batch(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels
        )
        print(f"exact={exact}: n_unique={plan.n_unique} "
              f"R={plan.n_rows_pad} Dw={cfg.row_width}")
        state = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = ffm_kernel.make_train_step(cfg, plan)

        state, loss = step(state)
        print(f"  warmup loss={float(loss):.5f}")

        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, loss = step(state)
        final = float(loss)   # forces the chained device work
        dt = (time.perf_counter() - t0) / n_steps
        ex_s = B / dt
        results[exact] = (dt, ex_s, final)
        print(f"  {dt*1e3:.2f} ms/step, {ex_s:,.0f} ex/s, loss={final:.5f} "
              f"(reference: 1,546 ex/s)")

    # quality: 5 epochs from fresh init (reference TEST_FFM regime), exact
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=ds.n_features, n_fields=ds.n_fields, factor=4,
        learning_rate=0.05, l2=1e-4, exact=True,
    )
    plan = ffm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels
    )
    state = ffm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = ffm_kernel.make_train_step(cfg, plan)
    for _ in range(5):
        state, loss = step(state)
    print(f"5-epoch train loss={float(loss):.5f}")

    params = ffm_kernel.export_params(state, plan, cfg)
    cfg_d = ffm.FFMConfig(n_features=ds.n_features, n_fields=ds.n_fields,
                          factor=4)
    test = load_libffm("/root/reference/data/test_sparse.csv",
                       n_features=ds.n_features, n_fields=ds.n_fields)
    m = batch_score(ffm, cfg_d, params, test, batch_size=200)
    print(f"test: {m}  (reference FFM 5ep: auc=0.478 logloss=1.82)")


if __name__ == "__main__":
    main()
