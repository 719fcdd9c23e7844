"""Streaming kernel FM: xmat (per-batch count matrices) vs fine-window
Pallas kernels, packed master, B=256/L=64/1M-vocab regime (the PARITY.md
streaming rows). Timing is per-dispatch chained (the deployment regime —
batches arrive one at a time), state chained through N steps with one
final readback.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_stream_xmat.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import fm_kernel

    B, L, vocab = 256, 64, 1_000_000
    capacity, b_pad = 20480, 256
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, vocab, (B, L)).astype(np.int32))
    vals = jnp.ones((B, L), jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32))
    rmask = jnp.ones((B,), jnp.float32)

    b = fm_kernel.plan_batch_on_device(ids, vals, mask, labels, rmask,
                                       capacity=capacity, b_pad=b_pad)
    out = {"B": B, "capacity": capacity}
    for name, kw in (
        ("xmat", dict(xmat=True)),
        ("fine", dict(fine=True)),
    ):
        cfg = fm_kernel.KernelFMConfig(
            n_features=vocab, factor=8, learning_rate=0.05, exact=True, **kw
        )
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        step = fm_kernel.make_streaming_train_step_packed(cfg, capacity,
                                                          b_pad)
        state, loss = step(state, b)
        float(loss)
        n = 200
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state, b)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        out[f"stream_{name}_ms"] = round(dt * 1e3, 3)
        out[f"stream_{name}_examples_per_sec"] = round(B / dt, 1)
        print(json.dumps(out), flush=True)

    # plan+step end-to-end (device planning included, as the engine runs)
    cfg = fm_kernel.KernelFMConfig(n_features=vocab, factor=8,
                                   learning_rate=0.05, exact=True, xmat=True)
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step_packed(cfg, capacity, b_pad)
    state, loss = step(state, fm_kernel.plan_batch_on_device(
        ids, vals, mask, labels, rmask, capacity=capacity, b_pad=b_pad))
    float(loss)
    n = 100
    # distinct batches prepared OUTSIDE the timed loop (jnp.roll with a
    # python-int shift would compile a fresh program per iteration)
    batches = [jnp.asarray(np.roll(np.asarray(ids), i, axis=0))
               for i in range(n)]
    t0 = time.perf_counter()
    for bi_ids in batches:
        bi = fm_kernel.plan_batch_on_device(
            bi_ids, vals, mask, labels, rmask,
            capacity=capacity, b_pad=b_pad)
        state, loss = step(state, bi)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    out["stream_xmat_plan_plus_step_ms"] = round(dt * 1e3, 3)
    print(json.dumps(out), flush=True)

    # fused ONE-dispatch step (plan traced into the packed step) on raw
    # [B, L] device batches
    cfg = fm_kernel.KernelFMConfig(n_features=vocab, factor=8,
                                   learning_rate=0.05, exact=True, fine=True)
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    fstep = fm_kernel.make_streaming_train_step_fused(cfg, capacity, b_pad)
    state, loss = fstep(state, ids, vals, mask, labels, rmask)
    float(loss)
    t0 = time.perf_counter()
    for bi_ids in batches:
        state, loss = fstep(state, bi_ids, vals, mask, labels, rmask)
    float(loss)
    dt = (time.perf_counter() - t0) / len(batches)
    out["stream_fused_ms"] = round(dt * 1e3, 3)
    out["stream_fused_examples_per_sec"] = round(B / dt, 1)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
