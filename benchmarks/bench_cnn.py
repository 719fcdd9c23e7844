"""CNN (LeNet w/ 6->16 connection mask) training-step benchmark — the
reference's remaining headline chart (benchmark/vs_tf_cpu.png, README:27-39:
"NN train 5K epochs", batch 50/100/200/400, vs TensorFlow-CPU).

Normalising the published numbers ("epochs" there = gradient updates):
LightCTR processes batch*5000 examples in 26.08/45.52/102.82/202.23 s for
batch 50/100/200/400 -> ~9.6-9.9k examples/s at every batch size; TF-CPU
~6.5-7.1k. This script times OUR models/cnn.py step (same topology: conv5x6
-> maxpool2 -> conv3x16 masked -> conv3x20 -> FC(74) -> softmax, Adagrad)
on the same bundled train_dense.csv, scan-amortised with a final readback.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_cnn.py
"""

import json
import time

import numpy as np

REF_EXAMPLES_PER_SEC = 9600.0   # LightCTR vs_tf_cpu.png, see docstring
TF_CPU_EXAMPLES_PER_SEC = 6800.0


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu import optim
    from lightctr_tpu.data.dense import load_dense_csv
    from lightctr_tpu.models import cnn

    x, y, k = load_dense_csv("/root/reference/data/train_dense.csv",
                             max_rows=500)  # reference caps at 500 rows
    print(f"rows={len(x)} classes={k}", flush=True)

    cfg = cnn.CNNConfig(n_classes=k)
    tx = optim.chain(optim.clip_by_value(15.0), optim.adagrad(0.1))
    n_steps = 200
    out = {}

    for B in (50, 100, 200, 400):
        xb = jnp.asarray(x[:B])
        yb = jnp.asarray(y[:B])
        params = cnn.init(jax.random.PRNGKey(0), cfg)
        opt = tx.init(params)

        def step(carry, _):
            params, opt = carry
            loss, g = jax.value_and_grad(cnn.loss)(params,
                                                   {"x": xb, "y": yb}, cfg)
            upd, opt = tx.update(g, opt, params)
            return (optim.apply_updates(params, upd), opt), loss

        @jax.jit
        def run(params, opt):
            return jax.lax.scan(step, (params, opt), None, length=n_steps)

        (params, opt), losses = run(params, opt)
        warm = float(losses[0])
        t0 = time.perf_counter()
        (_, _), losses = run(params, opt)
        final = float(losses[-1])
        dt = (time.perf_counter() - t0) / n_steps
        ex_s = B / dt
        out[f"b{B}_step_ms"] = round(dt * 1e3, 3)
        out[f"b{B}_examples_per_sec"] = round(ex_s, 1)
        out[f"b{B}_vs_lightctr"] = round(ex_s / REF_EXAMPLES_PER_SEC, 1)
        out[f"b{B}_vs_tf_cpu"] = round(ex_s / TF_CPU_EXAMPLES_PER_SEC, 1)
        print(json.dumps({"batch": B, "warm_loss": round(warm, 4),
                          "final_loss": round(final, 4)}), flush=True)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
