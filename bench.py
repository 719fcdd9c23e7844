"""Benchmark: FM rank-8 full-batch training on the bundled sparse CTR data.

Mirrors the reference's headline benchmark (BASELINE.md: LightCTR trains FM
k=8 for 1000 full-batch epochs over the 1000-row train_sparse.csv in 9.32 s
on an AVX CPU => ~107,296 examples/sec). Here the identical workload — same
data, same model size, same full-batch Adagrad regime — runs as one jitted
step on a TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


REFERENCE_FM_EXAMPLES_PER_SEC = 1000 * 1000 / 9.32  # BASELINE.md vs_libfm k=8


def main():
    import jax

    from lightctr_tpu import optim
    from lightctr_tpu.data import load_libffm
    from lightctr_tpu.models import fm
    from lightctr_tpu.train.loop import TrainState, make_train_step

    ds = load_libffm("/root/reference/data/train_sparse.csv")
    batch_size = len(ds)  # full-batch, like the reference (train_fm_algo.cpp:38)

    batch = {
        "ids": ds.ids,
        "vals": ds.vals,
        "fields": ds.fields,
        "mask": ds.mask,
        "labels": ds.labels,
        "row_mask": np.ones((batch_size,), np.float32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    cfg = fm.FMConfig(n_features=ds.n_features, factor=8)
    tx = optim.adagrad(0.1)
    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    params = fm.init(init_rng, cfg)
    state = TrainState(params, tx.init(params), rng)
    step = make_train_step(fm, cfg, tx)

    # warmup/compile
    state, loss = step(state, batch)
    jax.block_until_ready(loss)

    n_steps = 200
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    examples_per_sec = n_steps * batch_size / dt
    final_loss = float(loss)
    if not np.isfinite(final_loss):
        print(json.dumps({"metric": "fm_examples_per_sec_per_chip", "value": 0.0,
                          "unit": "examples/sec", "vs_baseline": 0.0,
                          "error": "non-finite loss"}))
        sys.exit(1)

    print(json.dumps({
        "metric": "fm_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / REFERENCE_FM_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
