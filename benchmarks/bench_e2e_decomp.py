"""Decompose the honest e2e production row (r5: 32.6 ms/batch while the
host-planned repeated-batch partitioned step runs 8.7 ms — where do the
other ~24 ms go?). Times, at the e2e octave shapes (cap 40960, fine):

  fused_resident   the ONE-dispatch fused partitioned step on a
                   device-RESIDENT raw batch, state-chained: device
                   planner (argsort over 262144 positions) + step,
                   no host work, no transfer
  hostplan_step    the host-planned partitioned step (plan_to_arrays
                   at the SAME cap) on device-resident plan arrays —
                   the device-sort-free control
  transfer_only    jnp.asarray of the raw [B, L] arrays, forced

    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3600 python -u benchmarks/bench_e2e_decomp.py
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
    from lightctr_tpu.train.kernel_engine import (
        _capacity_octave,
        _partition_caps_octave_counts,
        _partition_unique_counts,
    )

    B, L, vocab = 4096, 64, 10_000_000
    rng = np.random.default_rng(0)
    ones = np.ones((B, L), np.float32)
    labels = rng.integers(0, 2, (B,)).astype(np.float32)
    ids = np.minimum(rng.zipf(1.2, (B, L)) - 1, vocab - 1).astype(np.int32)
    cfg = fm_kernel.KernelFMConfig(
        n_features=vocab, factor=8, learning_rate=0.05, exact=False,
        fine=True)
    bounds = (65_536, 262_144, 1_048_576, vocab)
    nu, counts = _partition_unique_counts(
        ids.reshape(-1), ones.reshape(-1), bounds)
    cap = _capacity_octave(nu, 5120, 262_144 + 5120)
    caps = _partition_caps_octave_counts(counts)
    out = {"cap": cap, "caps": list(caps), "n_unique": nu}
    b_pad = 4096

    # --- fused one-dispatch step, device-resident batch, state-chained
    step_f = fm_kernel.make_streaming_train_step_fused_partitioned(
        cfg, cap, b_pad, bounds, caps)
    st = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    dev = (jnp.asarray(ids), jnp.asarray(ones), jnp.asarray(ones),
           jnp.asarray(labels), jnp.asarray(np.ones((B,), np.float32)))
    (st, loss), ovf = step_f(st, *dev)
    assert not bool(ovf)
    float(loss)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        (st, loss), ovf = step_f(st, *dev)
    float(loss)
    out["fused_resident_ms"] = round((time.perf_counter() - t0) / n * 1e3, 3)
    print(json.dumps(out), flush=True)
    del st

    # --- host-planned control at the SAME octave cap
    plan = fm_kernel.plan_batch(ids.astype(np.int64), ones, ones, labels,
                                n_rows_pad=cap, fine=True)
    arrays = jax.tree_util.tree_map(
        jnp.asarray, fm_kernel.plan_to_arrays(plan, cap))
    step_h = fm_kernel.make_streaming_train_step_partitioned(
        cfg, cap, b_pad, bounds, caps)
    sth = fm_kernel.partition_streaming_state(
        fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg),
        bounds)
    (sth, loss), ovf = step_h(sth, arrays)
    assert not bool(ovf)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        (sth, loss), ovf = step_h(sth, arrays)
    float(loss)
    out["hostplan_step_ms"] = round((time.perf_counter() - t0) / n * 1e3, 3)
    print(json.dumps(out), flush=True)

    # --- raw-batch H2D transfer, forced via a tiny reduction readback
    @jax.jit
    def touch(a, b_, c, d, e):
        return a.sum() + b_.sum() + c.sum() + d.sum() + e.sum()

    t0 = time.perf_counter()
    for _ in range(20):
        dev2 = (jnp.asarray(ids), jnp.asarray(ones), jnp.asarray(ones),
                jnp.asarray(labels),
                jnp.asarray(np.ones((B,), np.float32)))
        float(touch(*dev2))
    out["transfer_plus_touch_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 3)
    # host plan cost on this thread for the record
    t0 = time.perf_counter()
    for _ in range(10):
        _partition_unique_counts(ids.reshape(-1), ones.reshape(-1), bounds)
    out["host_counts_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 3)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
