"""Wide-D MFU probe (r5, VERDICT r4 weak #4 / next #6): does bf16 or a
lane-aligned width move the design-matrix engine's MFU at k=64+?

Context: the k=8 xmat step measured bf16 SLOWER (0.79 vs 0.28 ms —
casts cost more than the halved traffic saves, PARITY.md), but that
rationale was measured at D=17 row width (weight-load-bound MXU) and
does not automatically transfer to the k=64 config (D=129 — spans the
128-lane boundary) where the r4 probe reported 12.2% MFU fp32-exact.
This measures, on the bundled data's full-batch plan (b_pad=1024,
R=9216; reference vs_libfm k=64 analogue):

    k=64 exact / bf16        the r4 config, both compute dtypes
    k=127 exact / bf16       rows pad to D=128: one full lane tile,
                             no boundary-spanning — isolates the
                             lane-alignment story from the dtype story
    k=255 exact / bf16       D=256, two full tiles: the occupancy curve
                             keeps climbing (35.8% MFU measured)

MFU convention matches bench.py: model FLOPs = 4 count-matrix matmuls
(2 MACs each) over the v5e bf16 peak (197 TFLOP/s), so fp32 rows are
charged against the bf16 peak (honest worst case).

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3600 python -u benchmarks/bench_k64_bf16.py
"""

import json
import time

import numpy as np


def main():
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    plan = fm_kernel.plan_batch(ds.ids.astype(np.int64), ds.vals, ds.mask,
                                ds.labels)
    out = {"b_pad": plan.b_pad, "R": plan.n_rows_pad}

    def run(k, exact):
        cfg = fm_kernel.KernelFMConfig(
            n_features=ds.n_features, factor=k, learning_rate=0.05,
            xmat=True, exact=exact)
        st = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
        step = fm_kernel.make_train_step(cfg, plan)
        runner = fm_kernel.make_multi_step(step, 200)
        _, losses = runner(st)
        float(losses[-1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, losses = runner(st)
            float(losses[-1])
            best = min(best, (time.perf_counter() - t0) / 200)
        flops = 2 * 2 * plan.b_pad * plan.n_rows_pad * ((k + 1) + k)
        return best, flops / best / 197e12 * 100.0

    for k in (64, 127, 255):
        for exact in (True, False):
            label = f"k{k}_{'fp32' if exact else 'bf16'}"
            try:
                dt, mfu = run(k, exact)
                out[f"{label}_step_ms"] = round(dt * 1e3, 3)
                out[f"{label}_mfu_pct"] = round(mfu, 2)
            except Exception as e:                     # noqa: BLE001
                out[f"{label}_error"] = str(e)[:120]
            print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
