"""Windowed/tiered master-table scatter prototypes (VERDICT r4 #1).

bench_cache_probe.py measured the decisive fact: XLA-TPU row-scatter
cost scales with TABLE SIZE — 34 ns/row into [65k, 32] vs 275 ns/row
into [10M, 32] (gather is flat ~50-66 ns/row) — and the zipf production
step is ~80% master scatter. So instead of a cross-batch cache (host
analysis: zipf-1.2 consecutive-batch overlap is only 28%, ideal top-C
hit rate 53%/62% at C=64k/131k — hits can't be made free anyway), write
the sorted update rows through DYNAMIC-SLICE WINDOWS of the master:
slice a [W, 32] window out (contiguous = bandwidth-cheap), scatter the
window's rows into it at the small-table rate, slice it back. Sorted
ascending uids make every tier/window's rows a CONTIGUOUS rank range,
so the per-tier operands are dynamic_slices of rows_new — no extra row
gathers.

Measures (zipf-1.2 and uniform production shapes, V=10M):
  1. direct full-table scatter baseline (the current step's push)
  2. drop-heavy direct scatter (how much do dropped indices cost?)
  3. hot-tier push: windows at id < 64k/256k/1M + direct cold tail
  4. full windowed sweep (uniform): lax.scan over W-row windows
  5. correctness: each prototype == direct scatter, bit-exact

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python benchmarks/bench_tiered_scatter.py
"""

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lightctr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    small = bool(os.environ.get("LIGHTCTR_PROBE_SMALL"))
    V = 100_000 if small else 10_000_000
    B, L = (256, 64) if small else (4096, 64)
    D = 32
    rng = np.random.default_rng(0)
    out = {}

    def uniq_pad(ids, capacity):
        u = np.unique(ids.reshape(-1))
        n = len(u)
        upad = np.full(capacity, V, np.int32)  # V = OOB drop sentinel
        upad[:n] = u
        return upad, n

    zipf = np.minimum(rng.zipf(1.2, (B, L)) - 1, V - 1).astype(np.int64)
    unif = rng.integers(0, V, (B, L)).astype(np.int64)
    cap_z = 36_864 if not small else 4096
    cap_u = 262_144 if not small else 16_384
    uz, nz = uniq_pad(zipf, cap_z)
    uu, nu = uniq_pad(unif, cap_u)
    out["zipf_unique"] = nz
    out["uniform_unique"] = nu

    def timed_scatter(fn, master0, *args, n=30):
        m = fn(master0, *args)
        float(m[0, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            m = fn(m, *args)
        float(m[0, 0])
        return (time.perf_counter() - t0) / n * 1e3

    # --- 1. direct baselines (donated, like the real step)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def direct(master, idx, rows):
        return master.at[idx].set(rows, mode="drop")

    for name, upad, cap in (("zipf", uz, cap_z), ("uniform", uu, cap_u)):
        master = jnp.zeros((V, D), jnp.float32)
        idx = jnp.asarray(upad)
        rows = jnp.asarray(
            rng.normal(size=(cap, D)).astype(np.float32))
        out[f"direct_{name}_ms"] = round(
            timed_scatter(direct, master, idx, rows), 3)
        print(json.dumps(out), flush=True)

    # --- 2. drop-heavy direct scatter: same zipf index array but only
    # ~25% of entries in range (the overflow-safety-net cost question)
    frac_live = 0.25
    drop_idx = uz.copy()
    kill = rng.random(cap_z) > frac_live
    drop_idx[kill] = V
    master = jnp.zeros((V, D), jnp.float32)
    rows = jnp.asarray(rng.normal(size=(cap_z, D)).astype(np.float32))
    out["drop75_zipf_ms"] = round(
        timed_scatter(direct, master, jnp.asarray(drop_idx), rows), 3)
    # and a fully-dropped one (pure per-index overhead)
    all_drop = np.full(cap_z, V, np.int32)
    master = jnp.zeros((V, D), jnp.float32)
    out["drop100_zipf_ms"] = round(
        timed_scatter(direct, master, jnp.asarray(all_drop), rows), 3)
    print(json.dumps(out), flush=True)

    # --- 3. hot-tier push for zipf: tier boundaries C = (64k, 256k, 1M),
    # caps from observed traffic + slack; cold tail direct; overflow net
    # skipped here (measured separately via drop100 above)
    if small:
        tiers = ((4_096, 3_072), (16_384, 2_048))
    else:
        tiers = ((65_536, 20_480), (262_144, 7_168), (1_048_576, 5_120))

    n_tiers = len(tiers)
    bounds = np.array([t[0] for t in tiers], np.int32)

    def tiered_push(master, idx, rows):
        # n_t = rows with id < C_t  (idx is ascending, pad = V)
        starts = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.sum(idx[None, :] < jnp.asarray(bounds)[:, None],
                    axis=1).astype(jnp.int32),
        ])
        base = 0
        for t, (C_t, cap_t) in enumerate(tiers):
            W_t = C_t - base
            s = starts[t]
            idx_t = lax.dynamic_slice(idx, (s,), (cap_t,)) - base
            rows_t = lax.dynamic_slice(rows, (s, 0), (cap_t, D))
            win = lax.dynamic_slice(master, (base, 0), (W_t, D))
            # ids >= C_t (overshoot into the next tier) and pad entries
            # land OOB of the window -> dropped; written by later tiers
            win = win.at[idx_t].set(rows_t, mode="drop")
            master = lax.dynamic_update_slice(master, win, (base, 0))
            base = C_t
        # cold tail: direct scatter, entries with id < base masked to OOB
        cold_idx = jnp.where(idx >= base, idx, V)
        return master.at[cold_idx].set(rows, mode="drop")

    tiered_push_j = jax.jit(tiered_push, donate_argnums=(0,))
    master = jnp.zeros((V, D), jnp.float32)
    idx = jnp.asarray(uz)
    rows = jnp.asarray(rng.normal(size=(cap_z, D)).astype(np.float32))
    out["tiered_zipf_ms"] = round(
        timed_scatter(tiered_push_j, master, idx, rows), 3)
    print(json.dumps(out), flush=True)

    # correctness: tiered == direct, bit-exact
    m1 = jax.jit(tiered_push)(jnp.zeros((V, D)), idx, rows)
    m2 = jax.jit(lambda m, i, r: m.at[i].set(r, mode="drop"))(
        jnp.zeros((V, D)), idx, rows)
    eq = bool(jnp.all(m1[: 2 * bounds[-1] // 1] == m2[: 2 * bounds[-1] // 1])
              & jnp.all(jnp.sum(m1, 0) == jnp.sum(m2, 0)))
    out["tiered_equals_direct"] = eq
    del m1, m2
    print(json.dumps(out), flush=True)

    # --- 4. full windowed sweep (uniform traffic): scan over V/W windows
    W = 16_384 if small else 65_536
    n_win = V // W
    cap_w = 1024 if small else 4096  # uniform: ~nu/n_win expected + slack

    def sweep_push(master, idx, rows):
        # per-window start positions in the sorted unique array
        th = (jnp.arange(n_win + 1, dtype=jnp.int32) * W)
        starts = jnp.sum(idx[None, :] < th[:, None], axis=1).astype(jnp.int32)

        def body(m, w):
            s = starts[w]
            idx_w = lax.dynamic_slice(idx, (s,), (cap_w,)) - w * W
            rows_w = lax.dynamic_slice(rows, (s, 0), (cap_w, D))
            win = lax.dynamic_slice(m, (w * W, 0), (W, D))
            win = win.at[idx_w].set(rows_w, mode="drop")
            return lax.dynamic_update_slice(m, win, (w * W, 0)), 0

        master, _ = lax.scan(body, master, jnp.arange(n_win, dtype=jnp.int32))
        # overflow net: rows a window couldn't cover (count > cap_w)
        pos = jnp.arange(idx.shape[0], dtype=jnp.int32)
        w_of = jnp.minimum(idx // W, n_win - 1)
        covered = (pos - starts[w_of]) < cap_w
        net_idx = jnp.where(covered, V, idx)
        return master.at[net_idx].set(rows, mode="drop")

    sweep_push_j = jax.jit(sweep_push, donate_argnums=(0,))
    master = jnp.zeros((V, D), jnp.float32)
    idx = jnp.asarray(uu)
    rows = jnp.asarray(rng.normal(size=(cap_u, D)).astype(np.float32))
    out["sweep_uniform_ms"] = round(
        timed_scatter(sweep_push_j, master, idx, rows), 3)
    m1 = jax.jit(sweep_push)(jnp.zeros((V, D)), idx, rows)
    m2 = jax.jit(lambda m, i, r: m.at[i].set(r, mode="drop"))(
        jnp.zeros((V, D)), idx, rows)
    out["sweep_equals_direct"] = bool(jnp.all(jnp.sum(m1, 0) == jnp.sum(m2, 0))
                                      & jnp.all(m1[:W] == m2[:W]))
    del m1, m2
    print(json.dumps(out), flush=True)

    # and the sweep on zipf traffic (does one mechanism serve both?)
    master = jnp.zeros((V, D), jnp.float32)
    idxz = jnp.asarray(uz)
    rowsz = jnp.asarray(rng.normal(size=(cap_z, D)).astype(np.float32))

    def sweep_push_z(master, idx, rows):
        th = (jnp.arange(n_win + 1, dtype=jnp.int32) * W)
        starts = jnp.sum(idx[None, :] < th[:, None], axis=1).astype(jnp.int32)

        def body(m, w):
            s = starts[w]
            idx_w = lax.dynamic_slice(idx, (s,), (cap_w,)) - w * W
            rows_w = lax.dynamic_slice(rows, (s, 0), (cap_w, D))
            win = lax.dynamic_slice(m, (w * W, 0), (W, D))
            win = win.at[idx_w].set(rows_w, mode="drop")
            return lax.dynamic_update_slice(m, win, (w * W, 0)), 0

        master, _ = lax.scan(body, master, jnp.arange(n_win, dtype=jnp.int32))
        pos = jnp.arange(idx.shape[0], dtype=jnp.int32)
        w_of = jnp.minimum(idx // W, n_win - 1)
        covered = (pos - starts[w_of]) < cap_w
        net_idx = jnp.where(covered, V, idx)
        return master.at[net_idx].set(rows, mode="drop")

    out["sweep_zipf_ms"] = round(
        timed_scatter(jax.jit(sweep_push_z, donate_argnums=(0,)),
                      master, idxz, rowsz), 3)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
