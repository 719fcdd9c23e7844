"""Streaming kernel FM with DEVICE-side batch planning — plan+step cost.

Replaces the host numpy plan (336 ms/batch measured in round 1, mostly
tunnel transfer) with fm_kernel.plan_batch_on_device: raw [B, L] device
batches in, one argsort+cumsum+window-extract program, streaming fused
step after it. Readback-chained timing.

    python benchmarks/bench_streaming_device.py [n_batches]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.ops.embedding_pallas import TILE

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    B, L, vocab = 256, 64, 1_000_000
    capacity = ((B * L + TILE + 1) + 2 * TILE - 1) // (2 * TILE) * (2 * TILE)
    b_pad = max((B + 127) // 128 * 128, 128)

    rng = np.random.default_rng(0)
    # skewed CTR-like ids: hot head + long tail
    ids_np = np.where(
        rng.random((n_batches, B, L)) < 0.3,
        rng.integers(0, 512, (n_batches, B, L)),
        rng.integers(0, vocab, (n_batches, B, L)),
    ).astype(np.int32)
    labels_np = rng.integers(0, 2, (n_batches, B)).astype(np.float32)

    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False
    )
    state = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step(cfg, capacity, b_pad)

    ones = jnp.ones((B, L), jnp.float32)
    rmask = jnp.ones((B,), jnp.float32)

    def plan(i):
        return fm_kernel.plan_batch_on_device(
            jnp.asarray(ids_np[i]), ones, ones, jnp.asarray(labels_np[i]),
            rmask, capacity=capacity, b_pad=b_pad,
        )

    # warmup/compile both programs
    state, loss = step(state, plan(0))
    print(f"warmup loss={float(loss):.5f}")

    t0 = time.perf_counter()
    for i in range(n_batches):
        state, loss = step(state, plan(i))
    final = float(loss)
    dt = (time.perf_counter() - t0) / n_batches
    print(f"plan+step: {dt*1e3:.2f} ms/batch, {B/dt:,.0f} ex/s, "
          f"loss={final:.5f}  (round-1 host plan alone: 336 ms/batch)")

    # plan-only cost (chained through a consumed scalar)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(n_batches):
        acc = acc + fm_kernel.plan_batch_on_device(
            jnp.asarray(ids_np[i]), ones, ones, jnp.asarray(labels_np[i]),
            rmask, capacity=capacity, b_pad=b_pad,
        )["n_unique"]
    float(acc)
    dt_plan = (time.perf_counter() - t0) / n_batches
    print(f"plan only: {dt_plan*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
