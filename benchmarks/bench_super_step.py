"""K-step super-batch vs sequential streaming at the production zipf
regime (union(8) = 0.63x the sequential master row-ops).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_super_step.py
"""

import json
import time

import numpy as np

K, B, L, V = 8, 4096, 64, 10_000_000


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import fm_kernel
    from lightctr_tpu.ops.embedding_pallas import TILE

    rng = np.random.default_rng(0)
    ids = np.minimum(rng.zipf(1.2, (K, B, L)) - 1, V - 1).astype(np.int32)
    union = len(np.unique(ids))
    per = np.mean([len(np.unique(ids[k])) for k in range(K)])
    cap_seq = int(-(-(per + TILE + 1) // (2 * TILE)) * 2 * TILE)
    cap_sup = int(-(-(union + TILE + 1) // (2 * TILE)) * 2 * TILE)
    out = {"per_batch_unique": int(per), "union_unique": union,
           "cap_seq": cap_seq, "cap_sup": cap_sup}
    print(out, flush=True)

    interp = jax.default_backend() not in ("tpu", "axon")
    cfg = fm_kernel.KernelFMConfig(n_features=V, factor=8,
                                   learning_rate=0.05, exact=False,
                                   interpret=interp)
    b_pad = (B + 127) // 128 * 128
    args = (jnp.asarray(ids), jnp.ones((K, B, L), jnp.float32),
            jnp.ones((K, B, L), jnp.float32),
            jnp.asarray(rng.integers(0, 2, (K, B)).astype(np.float32)),
            jnp.ones((K, B), jnp.float32))

    # sequential fused steps at the per-batch capacity
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step_fused(cfg, cap_seq, b_pad)
    sargs = tuple(a[0] for a in args)
    state, loss = step(state, *sargs)
    float(loss)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        for k in range(K):
            state, loss = step(state, args[0][k], args[1][k], args[2][k],
                               args[3][k], args[4][k])
    float(loss)
    seq_ms = (time.perf_counter() - t0) / (n * K) * 1e3
    out["seq_step_ms"] = round(seq_ms, 3)
    out["seq_examples_per_sec"] = round(B / seq_ms * 1e3, 1)
    print("seq", out["seq_step_ms"], flush=True)

    # super-step
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    sup = fm_kernel.make_streaming_super_step_fused(cfg, cap_sup, b_pad, K)
    state, losses = sup(state, *args)
    float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        state, losses = sup(state, *args)
    float(losses[-1])
    sup_ms = (time.perf_counter() - t0) / (n * K) * 1e3
    out["super_step_ms"] = round(sup_ms, 3)
    out["super_examples_per_sec"] = round(B / sup_ms * 1e3, 1)
    out["speedup"] = round(seq_ms / sup_ms, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
