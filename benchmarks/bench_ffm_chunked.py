"""ffm_interaction vs ffm_interaction_chunked at a production shape.

VERDICT r1 #10: the chunked variant existed untimed. Shape: F=68, K=8,
B=4096, L=64 (SURVEY §7 "FFM memory" flag: unchunked materialises
[B, L, F, K] = 4096*64*68*8 floats ≈ 570 MB fp32 per instance; chunked
caps the gather at O(B*L*chunk*K)).

    python benchmarks/bench_ffm_chunked.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.ops.interactions import (
        ffm_interaction,
        ffm_interaction_chunked,
    )

    B, L, F, K, vocab = 4096, 64, 68, 8, 100_000
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(vocab, F, K)).astype(np.float32) * 0.01)
    ids = jnp.asarray(rng.integers(0, vocab, (B, L)).astype(np.int32))
    fields = jnp.asarray(rng.integers(0, F, (B, L)).astype(np.int32))
    xv = jnp.ones((B, L), jnp.float32)

    @jax.jit
    def full(v, c):
        return jnp.sum(ffm_interaction(v, ids, fields, xv, F)) + c

    def make_chunked(chunk):
        @jax.jit
        def f(v, c):
            return jnp.sum(
                ffm_interaction_chunked(v, ids, fields, xv, F, chunk=chunk)
            ) + c
        return f

    variants = [("unchunked", full)] + [
        (f"chunk={c}", make_chunked(c)) for c in (8, 17, 34)
    ]
    n_iters = 30
    for name, fn in variants:
        try:
            acc = fn(v, jnp.zeros(()))
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.zeros(())
            for _ in range(n_iters):
                acc = fn(v, acc)
            float(acc)
            dt = (time.perf_counter() - t0) / n_iters
            print(f"{name}: {dt*1e3:.2f} ms ({B/dt:,.0f} rows/s)")
        except Exception as e:  # noqa: BLE001 — OOM expected for some
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
