"""Benchmark: FM rank-8 full-batch training on the bundled sparse CTR data.

Mirrors the reference's headline benchmark (BASELINE.md: LightCTR trains FM
k=8 for 1000 full-batch epochs over the 1000-row train_sparse.csv in 9.32 s
on an AVX CPU => ~107,296 examples/sec). Same data, same model size, same
full-batch Adagrad regime, run through the fused Pallas kernel trainer
(models/fm_kernel.py: blocked one-hot MXU gather/reduce/scatter — see
ops/fm_fused_pallas.py).

Timing note: this backend's block_until_ready does not await real
completion, so the loop is chained through the training state and forced
with a scalar readback of the final loss.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


REFERENCE_FM_EXAMPLES_PER_SEC = 1000 * 1000 / 9.32  # BASELINE.md vs_libfm k=8


def main():
    import jax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm_kernel

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    batch_size = len(ds)  # full-batch, like the reference (train_fm_algo.cpp:38)

    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=8, learning_rate=0.05
    )
    plan = fm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels
    )
    state = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step = fm_kernel.make_train_step(cfg, plan)

    # warmup/compile
    state, loss = step(state)
    float(loss)

    n_steps = 500
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state)
    final_loss = float(loss)  # forces the dependent chain to finish
    dt = time.perf_counter() - t0

    examples_per_sec = n_steps * batch_size / dt
    if not np.isfinite(final_loss) or final_loss > 0.7:
        print(json.dumps({"metric": "fm_examples_per_sec_per_chip", "value": 0.0,
                          "unit": "examples/sec", "vs_baseline": 0.0,
                          "error": f"training diverged (loss={final_loss})"}))
        sys.exit(1)

    print(json.dumps({
        "metric": "fm_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / REFERENCE_FM_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
