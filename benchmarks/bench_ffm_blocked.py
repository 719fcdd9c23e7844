"""Field-blocked count-matrix FFM engine on the real TPU.

Exploits the partition structure: C[(b,f), r] is nonzero only where
rank_field[r] == f, so the [B*F, R] x [R, Dw] matmuls (5.6 ms of the
6.45 ms flat-agg step) collapse to 'bfr,frd->bfd' over
[B, F, R_max] x [F, R_max, Dw] — R/R_max fewer MACs (7.2x here: R=9216,
R_max=1280) and F x smaller count-matrix HBM traffic.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_blocked.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.models.fm_kernel import make_multi_step

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ds = load_libffm("/root/reference/data/train_sparse.csv")
    B = len(ds)
    bplan = ffm_kernel.plan_batch_blocked(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels,
        n_fields=ds.n_fields,
    )
    assert bplan is not None
    print(f"rows={B} F={bplan.n_fields} r_max={bplan.r_max} "
          f"blocked_rows={bplan.n_fields * bplan.r_max}", flush=True)
    out = {}
    for exact in (True, False):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=ds.n_features, n_fields=ds.n_fields, factor=4,
            learning_rate=0.05, l2=1e-4, exact=exact, agg=True,
        )
        state = ffm_kernel.init_blocked(jax.random.PRNGKey(0), cfg, bplan)
        step = ffm_kernel.make_train_step_blocked(cfg, bplan)
        run = make_multi_step(step, n_steps)
        _, losses = run(state)
        warm = float(losses[0])
        t0 = time.perf_counter()
        _, losses = run(state)
        final = float(losses[-1])
        dt = (time.perf_counter() - t0) / n_steps
        tag = "exact" if exact else "bf16"
        out[f"{tag}_ms"] = round(dt * 1e3, 3)
        out[f"{tag}_examples_per_sec"] = round(B / dt, 1)
        out[f"{tag}_warm"] = round(warm, 5)
        out[f"{tag}_final"] = round(final, 5)
        print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
