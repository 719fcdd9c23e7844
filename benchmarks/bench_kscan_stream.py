"""K-batch scan pipelining for the dispatch-bound streaming paths
(VERDICT r4 #4 — NOT the rejected union super-batch).

make_streaming_epoch_scan folds K independently-planned fused steps
(each doing its own plan/pull/compute/push) into ONE lax.scan dispatch:
per-step optimizer and exchange work stay batch-sized, only dispatch +
transfer amortise. Trajectory is bit-identical to K sequential fused
steps (tests/test_fm_streaming.py::test_epoch_scan_matches_sequential_
fused_steps). Baseline: the fused one-dispatch step at B=256, L=64,
1M vocab = 4.19 ms end-to-end ~ 61k ex/s (PARITY.md streaming table).

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python benchmarks/bench_kscan_stream.py
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
    from lightctr_tpu.ops.embedding_pallas import TILE

    B, L, vocab = 256, 64, 1_000_000
    capacity = ((B * L + TILE + 1) + 2 * TILE - 1) // (2 * TILE) * (2 * TILE)
    b_pad = 256
    rng = np.random.default_rng(0)
    out = {"B": B, "capacity": capacity}

    n_total = 64
    ids_np = np.where(
        rng.random((n_total, B, L)) < 0.3,
        rng.integers(0, 512, (n_total, B, L)),
        rng.integers(0, vocab, (n_total, B, L)),
    ).astype(np.int32)
    labels_np = rng.integers(0, 2, (n_total, B)).astype(np.float32)
    ones = np.ones((n_total, B, L), np.float32)
    rmask = np.ones((n_total, B), np.float32)

    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False)
    step = fm_kernel.make_streaming_train_step_fused(cfg, capacity, b_pad)

    # --- baseline: sequential fused steps (one dispatch each), batches
    # pre-staged on device (transfer excluded — same as the 4.19 ms row)
    state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    dev = [(jnp.asarray(ids_np[i]), jnp.asarray(ones[i]),
            jnp.asarray(ones[i]), jnp.asarray(labels_np[i]),
            jnp.asarray(rmask[i])) for i in range(n_total)]
    state, loss = step(state, *dev[0])
    float(loss)
    t0 = time.perf_counter()
    for i in range(n_total):
        state, loss = step(state, *dev[i])
    float(loss)
    dt = (time.perf_counter() - t0) / n_total
    out["sequential_step_ms"] = round(dt * 1e3, 3)
    out["sequential_examples_per_sec"] = round(B / dt, 1)
    print(json.dumps(out), flush=True)

    # --- K-scan: K batches per dispatch, INCLUDING the host->device
    # transfer of the stacked K batches (the honest end-to-end cost)
    run = fm_kernel.make_streaming_epoch_scan(step)
    for K in (8, 32):
        state = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
        stacked0 = tuple(jnp.asarray(a[:K]) for a in
                         (ids_np, ones, ones, labels_np, rmask))
        state, losses = run(state, *stacked0)
        float(losses[-1])                       # compile + sync
        n_chunks = n_total // K
        t0 = time.perf_counter()
        for c in range(n_chunks):
            sl = slice(c * K, (c + 1) * K)
            stacked = tuple(jnp.asarray(a[sl]) for a in
                            (ids_np, ones, ones, labels_np, rmask))
            state, losses = run(state, *stacked)
        float(losses[-1])
        dt = (time.perf_counter() - t0) / (n_chunks * K)
        out[f"kscan{K}_step_ms"] = round(dt * 1e3, 3)
        out[f"kscan{K}_examples_per_sec"] = round(B / dt, 1)
        print(json.dumps(out), flush=True)

    # --- fused PARTITIONED step at the same regime (r4): the finding
    # above says this step is exchange-bound — the range-partitioned
    # master attacks exactly that (PARITY.md partitioned-master row)
    bounds = (65_536, 262_144, vocab)
    # caps = host max over ALL batches' per-partition unique counts
    # (+octave rounding in partition_caps_for) so no batch overflows
    per_part = np.zeros(len(bounds), np.int64)
    for i in range(n_total):
        u = np.unique(ids_np[i])
        base = 0
        for p, bnd in enumerate(bounds):
            per_part[p] = max(per_part[p], ((u >= base) & (u < bnd)).sum())
            base = bnd
    caps = tuple(int(-(-c * 1.05 // 1024) * 1024) for c in per_part)
    stepq = fm_kernel.make_streaming_train_step_fused_partitioned(
        cfg, capacity, b_pad, bounds, caps)
    state_q = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg), bounds)
    (state_q, loss), ov = stepq(state_q, *dev[0])
    assert not bool(ov), caps
    float(loss)
    t0 = time.perf_counter()
    for i in range(n_total):
        (state_q, loss), ov = stepq(state_q, *dev[i])
    float(loss)
    dt = (time.perf_counter() - t0) / n_total
    out["fused_partitioned_step_ms"] = round(dt * 1e3, 3)
    out["fused_partitioned_examples_per_sec"] = round(B / dt, 1)
    out["fused_partitioned_caps"] = list(caps)

    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
