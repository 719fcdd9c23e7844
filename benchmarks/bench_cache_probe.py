"""Decisive measurements for the persistent hot-row cache idea
(VERDICT r4 #1): can a device-resident cache of hot vocab rows beat the
per-step full pull/push against the [10M, 32] packed master?

The idea only wins if row ops against a SMALL table are cheaper per row
than against the 10M-row master — host-side analysis already shows the
traffic itself cannot carry it alone: at zipf-1.2 (B=4096, L=64)
consecutive batches overlap only ~28%, and even an IDEAL top-C cache
covers 53%/62% of a batch's 34k unique rows at C=64k/131k, so ~16k/13k
miss rows ride the master exchange regardless. This probe measures:

  1. the zipf production step's real decomposition (full step vs
     gather-only vs scatter-only at the same [34k-unique] shape)
  2. per-row gather/scatter cost vs TABLE SIZE (64k ... 10M rows)
  3. scalar (1-element) scatter cost, for id->slot map maintenance

    cd /root/repo && timeout 3000 python benchmarks/bench_cache_probe.py
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

    import os

    small = bool(os.environ.get("LIGHTCTR_PROBE_SMALL"))
    out = {}
    B, L, vocab = (256, 64, 100_000) if small else (4096, 64, 10_000_000)
    rng = np.random.default_rng(0)
    ones = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    ids = np.minimum(rng.zipf(1.2, (B, L)) - 1, vocab - 1).astype(np.int64)

    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False,
        interpret=small)
    plan = fm_kernel.plan_batch(ids, ones, ones, labels)
    capacity = plan.n_rows_pad
    R = int(plan.n_unique)
    out["n_unique"] = R
    out["capacity"] = capacity

    # --- 1. full zipf step baseline (same as bench.py production zipf)
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    step = fm_kernel.make_streaming_train_step_packed(cfg, capacity,
                                                      plan.b_pad)
    arrays = fm_kernel.plan_to_arrays(plan, capacity)
    state, loss = step(state, arrays)
    float(loss)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, arrays)
    float(loss)
    out["zipf_full_step_ms"] = round((time.perf_counter() - t0) / n * 1e3, 3)
    print(json.dumps(out), flush=True)
    del state

    # --- 2. gather / scatter cost vs table size (same 34k-row id set,
    # re-mapped into each table's range by modulo — cost is per-row and
    # locality-free per PARITY, but we keep the realistic sorted-unique
    # structure anyway)
    uids_np = np.asarray(plan.uids[:capacity]).astype(np.int64)
    uids_np = uids_np[:R]  # the real unique ids (ascending)

    def timed(fn, *args, n=30):
        o = fn(*args)
        jnp.asarray(o)
        float(jnp.sum(o[0, :1]) if o.ndim == 2 else jnp.sum(o))
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args)[:1, :1])
        float(acc)
        return (time.perf_counter() - t0) / n * 1e3

    sizes = (4_096, 16_384, 100_000) if small else (
        65_536, 262_144, 1_048_576, 10_000_000)
    for V in sizes:
        table = jnp.ones((V, 32), jnp.float32)
        u = jnp.asarray(np.unique(uids_np % V).astype(np.int32))
        upad = jnp.asarray(
            np.pad(np.unique(uids_np % V), (0, R - len(np.unique(uids_np % V))),
                   constant_values=V - 1).astype(np.int32))
        rows = jnp.ones((R, 32), jnp.float32)

        @jax.jit
        def g(table, u):
            return table[u]

        @jax.jit
        def sc(table, u, rows):
            return table.at[u].set(rows)

        t_g = timed(g, table, upad)
        # scatter: chain the table through to defeat DCE
        s_t = sc(table, upad, rows)
        float(s_t[0, 0])
        t0 = time.perf_counter()
        for _ in range(30):
            s_t = sc(s_t, upad, rows)
        float(s_t[0, 0])
        t_s = (time.perf_counter() - t0) / 30 * 1e3
        out[f"gather_{V}_ms"] = round(t_g, 3)
        out[f"scatter_{V}_ms"] = round(t_s, 3)
        out[f"gather_{V}_ns_per_row"] = round(t_g * 1e6 / R, 1)
        out[f"scatter_{V}_ns_per_row"] = round(t_s * 1e6 / R, 1)
        print(json.dumps(out), flush=True)
        del table, s_t

    # --- 3. scalar scatter (id->slot map maintenance cost at cache size)
    C = 65_536
    n_idx = min(16_384, R)
    slotmap = jnp.zeros((C,), jnp.int32)
    idx = jnp.asarray((uids_np[:n_idx] % C).astype(np.int32))
    valv = jnp.arange(n_idx, dtype=jnp.int32)

    @jax.jit
    def sset(m, idx, v):
        return m.at[idx].set(v)

    m2 = sset(slotmap, idx, valv)
    int(m2[0])
    t0 = time.perf_counter()
    for _ in range(30):
        m2 = sset(m2, idx, valv)
    int(m2[0])
    out["scalar_scatter_16k_ms"] = round(
        (time.perf_counter() - t0) / 30 * 1e3, 3)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
