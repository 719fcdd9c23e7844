"""Staged (3 pallas_calls + XLA glue) vs two-phase mega-kernel FM step.

Bench workload = bench.py's: FM k=8 full-batch on train_sparse.csv.
Readback-chained timing, both compute modes.

    python benchmarks/bench_fused_step.py [n_steps]
"""

import sys
import time

import numpy as np


def main():
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels
    )

    for exact in (False, True):
        for fused in (False, True):
            cfg = fm_kernel.KernelFMConfig(
                n_features=ds.n_features, factor=8, learning_rate=0.05,
                exact=exact, fused=fused,
            )
            state = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
            step = fm_kernel.make_train_step(cfg, plan)
            state, loss = step(state)
            warm = float(loss)
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, loss = step(state)
            final = float(loss)
            dt = (time.perf_counter() - t0) / n_steps
            print(f"exact={exact} fused={fused}: {dt*1e3:.3f} ms/step, "
                  f"{B/dt:,.0f} ex/s, loss {warm:.5f}->{final:.5f}")


if __name__ == "__main__":
    main()
