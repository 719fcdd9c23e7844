"""Cost model for vocab-table gather/scatter at PS scale (10M rows).

bench_production_probe.py showed the streaming step is ~90% XLA
gather/scatter against the [10M, 16] master tables (~5.5 ns/element vs
the 1.7 ns/element measured on small tables — PARITY.md). This probe
decides the redesign: element-bound vs row-bound, and whether
indices_are_sorted/unique_indices hints change anything (uids from the
dedup are both).

    python benchmarks/bench_gather_cost.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    V, R = 10_000_000, 260_096
    rng = np.random.default_rng(0)
    uids = np.sort(rng.choice(V, R, replace=False)).astype(np.int32)
    u = jnp.asarray(uids)
    out = {}

    def timeit(fn, *args, n=20):
        o = fn(*args)
        float(jnp.sum(o) if o.ndim else o)
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        float(acc)
        return (time.perf_counter() - t0) / n * 1e3

    for W in (8, 16, 32):
        t = jnp.ones((V, W), jnp.float32)

        @jax.jit
        def gather_plain(t, u):
            return t[u]

        @jax.jit
        def gather_hint(t, u):
            return t.at[u].get(indices_are_sorted=True, unique_indices=True)

        out[f"gather_w{W}_ms"] = round(timeit(gather_plain, t, u), 3)
        out[f"gather_w{W}_hint_ms"] = round(timeit(gather_hint, t, u), 3)
        print(f"w{W}: plain={out[f'gather_w{W}_ms']} "
              f"hint={out[f'gather_w{W}_hint_ms']}", flush=True)

    # scatter: plain set vs hinted set, width 16 and packed 32
    def time_scatter(W, hint):
        t = jnp.ones((V, W), jnp.float32)
        g = jnp.full((R, W), 0.5, jnp.float32)

        if hint:
            @jax.jit
            def sc(t, u, g):
                return t.at[u].set(g, indices_are_sorted=True,
                                   unique_indices=True)
        else:
            @jax.jit
            def sc(t, u, g):
                return t.at[u].set(g)

        t2 = sc(t, u, g)
        float(t2[0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            t2 = sc(t2, u, g)
        float(t2[0, 0])
        return (time.perf_counter() - t0) / 20 * 1e3

    for W in (16, 32):
        out[f"scatter_w{W}_ms"] = round(time_scatter(W, False), 3)
        out[f"scatter_w{W}_hint_ms"] = round(time_scatter(W, True), 3)
        print(f"scatter w{W}: plain={out[f'scatter_w{W}_ms']} "
              f"hint={out[f'scatter_w{W}_hint_ms']}", flush=True)

    # scatter-add w16 (the current push's table op)
    t = jnp.ones((V, 16), jnp.float32)
    g = jnp.full((R, 16), 0.5, jnp.float32)

    @jax.jit
    def sc_add(t, u, g):
        return t.at[u].add(g, indices_are_sorted=True, unique_indices=True)

    t2 = sc_add(t, u, g)
    float(t2[0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        t2 = sc_add(t2, u, g)
    float(t2[0, 0])
    out["scatter_add_w16_hint_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 3)
    print("scatter_add w16 hint:", out["scatter_add_w16_hint_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
