"""Measure the design-matrix (cfg.xmat) full-batch FM/NFM step on TPU
against the fine-window Pallas kernel headline (PARITY.md: 2.13 ms).

The xmat step replaces every position-space op with dense matmuls against
the plan-constant count matrices Crow/Crow2 ([b_pad, R] ~ 34 MB fp32 at
this workload), so it should be HBM-bound on a handful of Crow passes.

Run exclusively (one TPU client at a time):
  cd /root/repo && timeout 3000 python benchmarks/bench_xmat.py
"""

import json
import time

import numpy as np


def time_steps(step, state, n=500):
    state2, loss = step(state)
    float(loss)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        state2, loss = step(state2)
    final = float(loss)
    dt = (time.perf_counter() - t0) / n
    return dt, final


def main():
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    out = {}

    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels
    )
    out["b_pad"] = int(plan.b_pad)
    out["n_rows_pad"] = int(plan.n_rows_pad)

    for name, kw in (
        ("xmat_exact", dict(xmat=True, exact=True)),
        ("xmat_bf16", dict(xmat=True, exact=False)),
    ):
        cfg = fm_kernel.KernelFMConfig(
            n_features=ds.n_features, factor=8, learning_rate=0.05, **kw
        )
        state = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = fm_kernel.make_train_step(cfg, plan)
        dt, final = time_steps(step, state)
        out[f"{name}_ms"] = round(dt * 1e3, 3)
        out[f"{name}_examples_per_sec"] = round(B / dt, 1)
        out[f"{name}_final_loss"] = round(final, 4)
        print(json.dumps(out), flush=True)

    # NFM xmat vs PARITY's 3.7 ms kernel NFM (k=8, hidden 32)
    from lightctr_tpu.models import nfm_kernel

    for name, kw in (
        ("nfm_xmat_exact", dict(xmat=True, exact=True)),
        ("nfm_xmat_bf16", dict(xmat=True, exact=False)),
    ):
        cfg = nfm_kernel.KernelNFMConfig(
            n_features=ds.n_features, factor=8, hidden=(32,),
            learning_rate=0.05, **kw
        )
        state = nfm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = nfm_kernel.make_train_step(cfg, plan)
        dt, final = time_steps(step, state)
        out[f"{name}_ms"] = round(dt * 1e3, 3)
        out[f"{name}_final_loss"] = round(final, 4)
        print(json.dumps(out), flush=True)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
