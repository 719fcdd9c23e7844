"""Production-regime (B=4096, L=64, 10M vocab) streaming-step breakdown.

bench.py's production row measured 74 ms/step where round 1's fused
kernel (rank-space state, no master table) measured 4.76 ms at the same
shape. This probe times, on the real chip with readback-chained loops:

  1. streaming step as shipped (no donation)
  2. streaming step with donate_argnums=(0,)  [table+accum update in place]
  3. master-table pull alone (gather [R] rows of [10M, 16])
  4. push alone (two scatters into [10M, 16])
  5. the non-streaming kernel step at the same shape (r1's 861k row)

    python benchmarks/bench_production_probe.py
"""

import json
import time

import numpy as np


def timeit_state(step, state, *args, n=30):
    """Chain state through n steps, force a scalar readback."""
    state2, loss = step(state, *args)
    float(loss)
    t0 = time.perf_counter()
    s = state2
    for _ in range(n):
        s, loss = step(s, *args)
    float(loss)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import functools

    from lightctr_tpu.models import fm_kernel

    B, L, vocab = 4096, 64, 10_000_000
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, (B, L)).astype(np.int64)
    ones = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False
    )
    plan = fm_kernel.plan_batch(ids, ones, ones, labels)
    capacity = plan.n_rows_pad
    arrays = fm_kernel.plan_to_arrays(plan, capacity)
    arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    R = capacity
    out = {"capacity": int(capacity),
           "n_positions": int(arrays["ranks_sorted"].shape[0])}

    # 1. as shipped
    state = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step(cfg, capacity, plan.b_pad)
    out["stream_ms"] = round(timeit_state(step, state, arrays) * 1e3, 3)
    print("stream", out["stream_ms"], flush=True)

    # 2. donated
    state = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
    inner = fm_kernel.make_streaming_train_step(cfg, capacity, plan.b_pad)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def donated(s, b):
        return inner(s, b)

    out["stream_donated_ms"] = round(
        timeit_state(donated, state, arrays) * 1e3, 3)
    print("donated", out["stream_donated_ms"], flush=True)

    # 3. pull alone (readback via a scalar to avoid transferring rows)
    table = fm_kernel.streaming_init(jax.random.PRNGKey(0), cfg).table
    uids = arrays["uids"]

    @jax.jit
    def pull(t, u, salt):
        return jnp.sum(t[u]) + salt

    float(pull(table, uids, 0.0))
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(30):
        acc = pull(table, uids, acc)
    float(acc)
    out["pull_ms"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    print("pull", out["pull_ms"], flush=True)

    # 4. push alone (donated, chained through the table)
    g = jnp.ones((R, 16), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def push(t, a, u, g):
        a2 = a.at[u].set(g, mode="drop")
        t2 = t.at[u].add(g, mode="drop")
        return t2, a2

    accum = jnp.zeros_like(table)
    t2, a2 = push(table, accum, uids, g)
    float(t2[0, 0])
    t0 = time.perf_counter()
    for _ in range(30):
        t2, a2 = push(t2, a2, uids, g)
    float(t2[0, 0])
    out["push_ms"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    print("push", out["push_ms"], flush=True)

    # 5. non-streaming kernel step, same shape (state in rank space)
    state_k = fm_kernel.init(jax.random.PRNGKey(0), cfg, plan)
    step_k = fm_kernel.make_train_step(cfg, plan)
    out["rankspace_ms"] = round(timeit_state(step_k, state_k) * 1e3, 3)
    print("rankspace", out["rankspace_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
