"""Grouped field-blocked FFM engine on the real TPU.

The one-block layout (bench_ffm_blocked.py, 4.66 ms exact) pads every
field to the largest field's unique count (r_max=1280, 68*1280=87,040
table rows for 8,245 uniques). Here fields are DP-partitioned into
per-size groups ([3x1280 | 6x768 | 4x256 | 24x128] on the bundled
data's skew, 12,544 rows — 6.9x fewer), cutting the main einsum MACs,
count-matrix HBM traffic, and optimizer work.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_grouped.py
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
    gplan = ffm_kernel.plan_batch_grouped(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels,
        n_fields=ds.n_fields,
    )
    assert gplan is not None
    groups = [(e - s, r) for s, e, r in
              zip(gplan.f_start, gplan.f_end, gplan.r_g)]
    print(f"rows={B} F={gplan.n_fields} active={gplan.n_active} "
          f"groups(F_g x r_g)={groups} total_rows={gplan.n_rows_total}",
          flush=True)
    out = {"total_rows": gplan.n_rows_total}
    for exact in (True, False):
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=ds.n_features, n_fields=ds.n_fields, factor=4,
            learning_rate=0.05, l2=1e-4, exact=exact, agg=True,
        )
        state = ffm_kernel.init_grouped(jax.random.PRNGKey(0), cfg, gplan)
        step = ffm_kernel.make_train_step_grouped(cfg, gplan)
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
