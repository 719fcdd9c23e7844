"""Auto-capacity octaves on skewed streaming-FFM traffic (VERDICT r2 #5).

PARITY.md's r2 row: the fused streaming FFM step at B=256 pays the
static worst-case capacity B*L (18432 -> 14.96 ms) even though
realistic skew admits far smaller rank spaces. r3's engines pick
capacity octaves from the OBSERVED per-batch unique count
(train/kernel_engine._capacity_octave); this measures the win at the
bundled-data shape (vocab 234k, F=68, K=4, L=68) on zipf-1.2 traffic.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_ffm_autocap.py
"""

import json
import time

import numpy as np

B, L, F, V = 256, 68, 68, 233789


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.ops.embedding_pallas import TILE
    from lightctr_tpu.train.kernel_engine import _capacity_octave

    rng = np.random.default_rng(0)
    ids = np.minimum(rng.zipf(1.2, (B, L)) - 1, V - 1).astype(np.int32)
    nu = len(np.unique(ids))
    fixed_cap = ((min(B * L, V) + 2 + 2 * TILE - 1) // (2 * TILE)) * (2 * TILE)
    auto_cap = _capacity_octave(nu, 2 * TILE, fixed_cap)
    out = {"unique": nu, "fixed_cap": int(fixed_cap),
           "auto_cap": int(auto_cap)}
    print(out, flush=True)

    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=F, factor=4, learning_rate=0.05,
        exact=True, agg=True)
    args = (jnp.asarray(ids), jnp.ones((B, L), jnp.float32),
            jnp.ones((B, L), jnp.float32),
            jnp.asarray((ids % F).astype(np.int32)),
            jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            jnp.ones((B,), jnp.float32))

    for name, cap in (("fixed", fixed_cap), ("auto", auto_cap)):
        state = ffm_kernel.streaming_init(jax.random.PRNGKey(0), cfg)
        step = ffm_kernel.make_streaming_train_step_fused(cfg, cap)
        state, loss = step(state, *args)
        float(loss)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state, *args)
        float(loss)
        out[f"{name}_step_ms"] = round(
            (time.perf_counter() - t0) / n * 1e3, 3)
        print(name, out[f"{name}_step_ms"], flush=True)

    out["speedup"] = round(out["fixed_step_ms"] / out["auto_step_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
