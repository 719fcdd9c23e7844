"""Streaming kernel FFM — fused one-dispatch step vs separate plan+step.

The PS-scale FFM regime (vocab-space master table, minibatches): raw
[B, L] device batches in, ffm_kernel.make_streaming_train_step_fused
plans (dedup/rank-assign) INSIDE the jitted train step, so each batch is
ONE program dispatch. Compares against plan_batch_on_device + the
separate streaming step (two dispatches). Readback-chained timing —
block_until_ready does not synchronise on this transport (CLAUDE.md).

    python benchmarks/bench_ffm_streaming.py [n_batches]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.ops.ffm_pallas import TILE

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    # bundled-data dims: 68 fields, vocab 233,789, K=4
    B, L, F, vocab, Kf = 256, 68, 68, 233_789, 4
    capacity = ((min(B * L, vocab) + 2) + 2 * TILE - 1) // (2 * TILE) * (2 * TILE)

    rng = np.random.default_rng(0)
    # skewed CTR-like ids, fields partitioned (ids % F) so the rank-field
    # self-term engine engages, as it does on real libffm data
    ids_np = np.where(
        rng.random((n_batches, B, L)) < 0.3,
        rng.integers(0, 512, (n_batches, B, L)),
        rng.integers(0, vocab, (n_batches, B, L)),
    ).astype(np.int32)
    fields_np = (ids_np % F).astype(np.int32)
    labels_np = rng.integers(0, 2, (n_batches, B)).astype(np.float32)

    cfg = ffm_kernel.KernelFFMConfig(
        n_features=vocab, n_fields=F, factor=Kf, learning_rate=0.05,
        exact=True, agg=True,
    )
    print(f"B={B} L={L} F={F} capacity={capacity} Dw={cfg.row_width} "
          f"backend={jax.default_backend()}", flush=True)

    ones = jnp.ones((B, L), jnp.float32)
    rmask = jnp.ones((B,), jnp.float32)

    # --- fused one-dispatch step ---
    state = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_f = ffm_kernel.make_streaming_train_step_fused(
        cfg, capacity, fields_partition=True)
    state, loss = step_f(state, jnp.asarray(ids_np[0]), ones, ones,
                         jnp.asarray(fields_np[0]), jnp.asarray(labels_np[0]),
                         rmask)
    print(f"warmup fused loss={float(loss):.5f}", flush=True)
    t0 = time.perf_counter()
    for i in range(n_batches):
        state, loss = step_f(state, jnp.asarray(ids_np[i]), ones, ones,
                             jnp.asarray(fields_np[i]),
                             jnp.asarray(labels_np[i]), rmask)
    final = float(loss)
    dt_f = (time.perf_counter() - t0) / n_batches
    print(f"fused transfer+plan+step: {dt_f*1e3:.2f} ms/batch, "
          f"{B/dt_f:,.0f} ex/s, loss={final:.5f}")

    # --- separate plan + step (two dispatches) ---
    state = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step_s = ffm_kernel.make_streaming_train_step(
        cfg, capacity, fields_partition=True)

    def plan(i):
        return ffm_kernel.plan_batch_on_device(
            jnp.asarray(ids_np[i]), ones, ones, jnp.asarray(fields_np[i]),
            jnp.asarray(labels_np[i]), rmask, capacity=capacity)

    state, loss = step_s(state, plan(0))
    t0 = time.perf_counter()
    for i in range(n_batches):
        state, loss = step_s(state, plan(i))
    final = float(loss)
    dt_s = (time.perf_counter() - t0) / n_batches
    print(f"separate plan+step:       {dt_s*1e3:.2f} ms/batch, "
          f"{B/dt_s:,.0f} ex/s, loss={final:.5f}")
    print(f"fused speedup: {dt_s/dt_f:.2f}x")


if __name__ == "__main__":
    main()
