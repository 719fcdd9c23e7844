"""Sharded-training scaling check (BASELINE: >=90% efficiency to 2 hosts).

Only one real chip is reachable in this environment, so this measures the
*logical* scaling of the sharded Wide&Deep step on a virtual CPU mesh:
constant per-device batch (weak scaling), mesh data axis 1 -> N. On real
multi-chip hardware the same code path applies; run there with
JAX_PLATFORMS unset.

    python benchmarks/bench_scaling.py [devices ...]      # default 1 2 4 8
"""

import sys
import time

import numpy as np


def main():
    import jax

    # Decide BEFORE touching any backend (jax_platforms/jax_num_cpu_devices
    # cannot be changed after initialization). A TPU runtime is detectable
    # without initializing JAX: an explicit JAX_PLATFORMS=tpu, a libtpu
    # install (real TPU VM/pod), or a registered PJRT TPU plugin.
    import importlib.util
    import os

    plat = os.environ.get("JAX_PLATFORMS", "").lower()
    if "cpu" in plat:
        on_accel = False          # explicit CPU request -> virtual mesh
    elif plat:
        on_accel = True           # explicit accelerator platform (tpu/plugin)
    else:
        # platform unset: a libtpu install means a real TPU VM/pod
        on_accel = (
            importlib.util.find_spec("libtpu") is not None
            or importlib.util.find_spec("libtpu_release") is not None
        )
    if not on_accel:
        # No TPUs visible: 8-way virtual CPU mesh so the logical scaling
        # path still runs. On a real pod slice the real devices are used.
        os.environ["JAX_PLATFORMS"] = "cpu"   # env var wins over config
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from lightctr_tpu import optim
    from lightctr_tpu.models import widedeep
    from lightctr_tpu.parallel import make_mesh, make_sharded_train_step, partition_batch
    from lightctr_tpu.parallel.sharding import init_sharded_state

    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    per_device_batch = 256
    n_features, n_fields, L = 1 << 16, 32, 64
    rng = np.random.default_rng(0)

    base_time = None
    for n in sizes:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        cfg = widedeep.WideDeepConfig(
            n_features=n_features, n_fields=n_fields, embed_dim=8, hidden=(64,)
        )
        tx = optim.adagrad(0.05)
        state = init_sharded_state(widedeep, cfg, tx, mesh, seed=0)
        step = make_sharded_train_step(widedeep, cfg, tx, mesh)

        B = per_device_batch * n
        ids = rng.integers(0, n_features, (B, L)).astype(np.int32)
        batch = {
            "ids": jnp.asarray(ids),
            "vals": jnp.ones((B, L), jnp.float32),
            "fields": jnp.asarray((ids % n_fields).astype(np.int32)),
            "mask": jnp.ones((B, L), jnp.float32),
            "labels": jnp.asarray(rng.integers(0, 2, (B,)).astype(np.float32)),
            "row_mask": jnp.ones((B,), jnp.float32),
        }
        batch = partition_batch(batch, mesh)

        state, loss = step(state, batch)
        float(loss)
        n_steps = 20
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, loss = step(state, batch)
        float(loss)
        dt = (time.perf_counter() - t0) / n_steps
        ex_s = B / dt
        if base_time is None:
            base_time = dt
        eff = base_time / dt  # weak scaling: ideal keeps step time constant
        print(
            f"devices={n}: {dt*1e3:.2f} ms/step, {ex_s:,.0f} ex/s "
            f"(weak-scaling efficiency {eff*100:.0f}%)"
        )

    # --- grouped full-batch FFM (the 0.62 ms headline trainer) sharded
    # over `data`: constant per-device batch rows ---
    from lightctr_tpu.models import ffm_kernel
    from lightctr_tpu.parallel.sharded_kernel import (
        make_grouped_sharded_ffm_step,
    )

    # vocab small enough that the batch SATURATES it at every size:
    # rows_total (and so the replicated table + per-shard count-matrix
    # slice) stays constant as B grows — true weak scaling. With an
    # unsaturated vocab the unique count grows with B and the per-device
    # step itself gets bigger, which is not a scaling measurement.
    ffm_vocab = 4096
    ncores = os.cpu_count() or 1
    print("grouped FFM (data-sharded full batch):")
    if not on_accel:
        print(f"  [virtual mesh on {ncores} physical cores: this step is "
              f"compute-dense, so efficiency at n > {ncores} devices is "
              "core-bound, not a property of the sharding]")
    base_time = None
    for n in sizes:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        B = per_device_batch * n
        ids = rng.integers(0, ffm_vocab, (B, L)).astype(np.int64)
        ones = np.ones((B, L), np.float32)
        labels = rng.integers(0, 2, (B,)).astype(np.float32)
        gplan = ffm_kernel.plan_batch_grouped(
            ids, ones, ones, (ids % n_fields).astype(np.int32), labels,
            n_fields=n_fields,
        )
        fcfg = ffm_kernel.KernelFFMConfig(
            n_features=ffm_vocab, n_fields=n_fields, factor=4,
            learning_rate=0.05, exact=True, agg=True,
        )
        state = ffm_kernel.init_grouped(jax.random.PRNGKey(0), fcfg, gplan)
        step = make_grouped_sharded_ffm_step(fcfg, gplan, mesh)
        state, loss = step(state)
        float(loss)
        n_steps = 20
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, loss = step(state)
        float(loss)
        dt = (time.perf_counter() - t0) / n_steps
        if base_time is None:
            base_time = dt
        print(
            f"devices={n}: {dt*1e3:.2f} ms/step, {B/dt:,.0f} ex/s "
            f"(weak-scaling efficiency {base_time/dt*100:.0f}%)"
        )


if __name__ == "__main__":
    main()
