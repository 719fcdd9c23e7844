"""Partitioned-master exchange prototype (VERDICT r4 #1, continued).

bench_tiered_scatter.py killed the in-place window designs: XLA scatter
cost is per-INDEX and scales with the TARGET table's size even for
dropped indices (drop100 5.33 ms == live 5.57 ms at V=10M), and
dynamic_update_slice on the 1.28 GB master doesn't alias (tiered push
29 ms vs direct 5.6 ms). What those receipts still allow: store the
master PARTITIONED — separate [S_p, 32] arrays per id range — so each
partition's exchange pays that partition's (smaller) per-index cost.
Sorted ascending uids make each partition's indices/rows a CONTIGUOUS
rank-range: dynamic_slice in, dynamic_update_slice out of the SMALL
[capacity, 32] rank buffer (cheap), no full-capacity padded arrays.

Caps are per-partition STATIC sizes chosen by the host planner from
observed traffic (+slack); a batch that overflows any cap falls back to
the direct step — correctness never depends on cap sizing.

Measures gather-side, scatter-side, and both, vs the direct packed
exchange, zipf-1.2 and uniform production shapes.

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python benchmarks/bench_partitioned_exchange.py
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

    # partition boundaries (id space) and per-partition caps (rank space)
    if small:
        BOUNDS = (4_096, 16_384, V)
        CAPS = (3_072, 2_048, 4_096)
        cap_z = 4_096
    else:
        BOUNDS = (65_536, 262_144, 1_048_576, V)
        # zipf-1.2 observed per-partition uniques 18053/6089/4637/5333
        CAPS = (20_480, 7_168, 5_632, 7_168)
        cap_z = 36_864
    sizes = np.diff(np.concatenate([[0], BOUNDS]))
    bases = np.concatenate([[0], BOUNDS[:-1]])
    n_parts = len(BOUNDS)

    # pad the rank-space arrays by CAP_max so dynamic_slice/
    # dynamic_update_slice at offset starts[p] can never clamp (XLA
    # clamps OOB starts, which would silently misalign the placement)
    CAP_max = max(CAPS)
    cap_ext = cap_z + CAP_max

    zipf = np.minimum(rng.zipf(1.2, (B, L)) - 1, V - 1).astype(np.int64)
    u = np.unique(zipf.reshape(-1))
    nz = len(u)
    uz = np.full(cap_ext, V, np.int32)
    uz[:nz] = u
    out["zipf_unique"] = nz
    counts = [int(((u >= b) & (u < e)).sum())
              for b, e in zip(bases, BOUNDS)]
    out["zipf_partition_counts"] = counts
    assert all(c <= cap for c, cap in zip(counts, CAPS)), (counts, CAPS)

    rows_new = rng.normal(size=(cap_ext, D)).astype(np.float32)

    # ---- direct baseline (single packed master), donated
    @functools.partial(jax.jit, donate_argnums=(0,))
    def direct_push(master, idx, rows):
        return master.at[idx].set(rows, mode="drop")

    @jax.jit
    def direct_pull(master, idx):
        return master[jnp.minimum(idx, V - 1)]

    def chain_time(fn, state, *args, n=30):
        s = fn(state, *args)
        float(s[0][0, 0] if isinstance(s, tuple) else s[0, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s, *args)
        float(s[0][0, 0] if isinstance(s, tuple) else s[0, 0])
        return (time.perf_counter() - t0) / n * 1e3

    master = jnp.zeros((V, D), jnp.float32)
    idx = jnp.asarray(uz)               # [cap_ext] for the partitioned ops
    idx_d = jnp.asarray(uz[:cap_z])     # [cap_z] — the direct step's shape
    rows = jnp.asarray(rows_new)
    rows_d = jnp.asarray(rows_new[:cap_z])
    out["direct_push_ms"] = round(
        chain_time(direct_push, master, idx_d, rows_d), 3)

    master = jnp.zeros((V, D), jnp.float32)
    o = direct_pull(master, idx_d)
    float(o[0, 0])
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(30):
        acc = acc + direct_pull(master, idx_d)[0, 0]
    float(acc)
    out["direct_pull_ms"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    print(json.dumps(out), flush=True)
    del master

    # ---- partitioned master
    def parts_init():
        return tuple(jnp.zeros((int(s), D), jnp.float32) for s in sizes)

    def part_starts(idx):
        # n_p = #ids < bound_p; ascending idx => partition p covers ranks
        # [starts[p], starts[p+1])
        th = jnp.asarray(np.asarray(bases, np.int32))
        return jnp.sum(idx[None, :] < th[:, None], axis=1).astype(jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def part_push(parts, idx, rows):
        starts = part_starts(idx)
        new = []
        for p in range(n_parts):
            s = starts[p]
            idx_p = lax.dynamic_slice(idx, (s,), (CAPS[p],)) - int(bases[p])
            rows_p = lax.dynamic_slice(rows, (s, 0), (CAPS[p], D))
            # overshoot entries have ids >= bound_p -> OOB -> drop
            idx_p = jnp.where(idx_p < 0, int(sizes[p]), idx_p)
            new.append(parts[p].at[idx_p].set(rows_p, mode="drop"))
        return tuple(new)

    @jax.jit
    def part_pull(parts, idx):
        starts = part_starts(idx)
        buf = jnp.zeros((cap_ext, D), jnp.float32)
        for p in range(n_parts):
            s = starts[p]
            idx_p = lax.dynamic_slice(idx, (s,), (CAPS[p],)) - int(bases[p])
            got = parts[p][jnp.clip(idx_p, 0, int(sizes[p]) - 1)]
            # place into rank space at dynamic offset; rows beyond this
            # partition's true count get overwritten by the next p
            buf = lax.dynamic_update_slice(buf, got, (s, 0))
        return buf[:cap_z]

    parts = parts_init()
    out["part_push_ms"] = round(chain_time(part_push, parts, idx, rows), 3)
    print(json.dumps(out), flush=True)

    parts = parts_init()
    o = part_pull(parts, idx)
    float(o[0, 0])
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(30):
        acc = acc + part_pull(parts, idx)[0, 0]
    float(acc)
    out["part_pull_ms"] = round((time.perf_counter() - t0) / 30 * 1e3, 3)
    print(json.dumps(out), flush=True)

    # ---- correctness: push-then-pull reproduces rows (valid ranks), and
    # partitioned == direct masters
    parts = jax.jit(part_push)(parts_init(), idx, rows)
    direct_m = jax.jit(lambda m, i, r: m.at[i].set(r, mode="drop"))(
        jnp.zeros((V, D)), idx_d, rows_d)
    ok = True
    for p in range(n_parts):
        a = np.asarray(parts[p])
        b = np.asarray(direct_m[int(bases[p]):int(BOUNDS[p])])
        ok = ok and bool((a == b).all())
    out["part_equals_direct"] = ok
    got = np.asarray(jax.jit(part_pull)(parts, idx))
    ok2 = bool((got[:nz] == np.asarray(rows)[:nz]).all())
    out["pull_roundtrip_exact"] = ok2

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
