"""Kernel-engine training driver: the fused Pallas trainers as the
PRODUCT path (reference: the one binary runs its fast implementation,
/root/reference/main.cpp:144-148 -> Train_FM_Algo; here
`cli.py train --engine kernel` reaches the same fused kernels bench.py
measures).

Engines:
  fm  — streaming minibatch (vocab-space master tables, per-batch plans
        built ON DEVICE by fm_kernel.plan_batch_on_device and dispatched
        from the Prefetcher thread), or single-plan full-batch when
        batch_size >= dataset rows (the reference FM regime,
        train_fm_algo.cpp:38).
  nfm — same streaming cycle plus the XLA MLP tower.
  ffm — full-batch on the count-matrix (agg) engine by default: 6.45 ms
        vs the dense-sweep kernels' 43.1 ms on the bundled data (PARITY.md,
        100x the reference FFM), and pure XLA so the CPU/interpret path is
        usable too. batch_size < rows (CLI `--stream`) switches to the
        fused ONE-dispatch streaming trainer against the vocab-space
        master table (the PS-scale regime; same cycle as fm/nfm).

Each returns a params dict in the corresponding dense model's format, so
checkpointing (train/checkpoint.py) and scoring (serve/scorer.py) are the
same downstream flow as the dense engine.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..data.batching import sparse_batches
from ..data.pipeline import Prefetcher
from ..models import ffm_kernel, fm_kernel, nfm_kernel
from ..ops.embedding_pallas import TILE


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# streaming xmat gate: Crow+Crow2 ([b_pad, capacity] fp32 each) must fit
# comfortably next to the master tables (v5e HBM 16 GB)
XMAT_STREAM_MAX_BYTES = 256 * 1024 * 1024

# field-blocked FFM gate: table+accum ([F*r_max, Dw] fp32 each) under
# extreme field skew must stay a small fraction of HBM
FFM_BLOCKED_MAX_BYTES = 1024 * 1024 * 1024


def _interpret() -> bool:
    """Pallas interpret mode off TPU (CPU tests/CLI runs use the same code
    path through the interpreter; compiled Mosaic on real chips)."""
    return jax.default_backend() not in ("tpu", "axon")


def _streaming_dims(ds, batch_size: int, fine: bool = False):
    """(capacity, b_pad) for the streaming kernel step. fine=True rounds
    capacity for the 5x128-window kernels too (lcm(2*TILE, 5*128) =
    5120)."""
    L = ds.ids.shape[1]
    max_uniques = min(batch_size * L, ds.n_features)
    mult = 5120 if fine else 2 * TILE
    capacity = _round_up(max_uniques + TILE + 1, mult)
    b_pad = max(_round_up(batch_size, 128), 128)
    return capacity, b_pad




# epoch-scan gate: datasets whose whole epoch stacks under this many
# [B, L] positions train via ONE lax.scan dispatch per epoch
EPOCH_SCAN_MAX_POSITIONS = 2_000_000


def _partition_bounds(n_features: int) -> tuple:
    """Standard id-range partition bounds for the partitioned master
    (fm_kernel.StreamingFMStatePartitioned): 64k/256k/1M split points
    below the vocab, vocab-terminated. Returns a 1-tuple (degenerate —
    caller should use the packed layout) for small vocabularies."""
    pts = [b for b in (65_536, 262_144, 1_048_576) if b < n_features]
    return tuple(pts) + (n_features,)


def _partition_caps_octave_counts(counts) -> tuple:
    """Octave-bucketed per-partition caps from per-partition unique
    COUNTS: smallest 1024 * 2^k >= count — stationary traffic re-uses
    one compiled program; caps >= counts by construction so the
    partitioned step's overflow flag can never fire for this batch."""
    caps = []
    for c in counts:
        cap = 1024
        while cap < c:
            cap <<= 1
        caps.append(int(cap))
    return tuple(caps)


def _partition_caps_octave(u_sorted: np.ndarray, bounds: tuple) -> tuple:
    """Octave caps from a batch's SORTED unique ids (numpy path)."""
    edges = np.searchsorted(u_sorted, np.asarray(bounds))
    counts = np.diff(np.concatenate([[0], edges]))
    return _partition_caps_octave_counts(counts)


def _partition_unique_counts(flat_ids: np.ndarray, mask_flat: np.ndarray,
                             bounds: tuple):
    """(n_unique, per-partition unique counts) for the partitioned
    master's octave caps — ONE native hash-set pass
    (csrc/plan_server.cpp lc_count_unique_ranges) when the library is
    present; numpy sort-unique + searchsorted is the fallback and the
    reference implementation (tests/test_plan_native.py pins equality).
    Exists because the honest e2e production row measured the
    per-batch np.unique(262k) on the Prefetcher thread as its
    bottleneck (bench.py production_zipf_e2e_*)."""
    try:
        from ..data.native import count_unique_ranges_native

        counts = count_unique_ranges_native(
            flat_ids.astype(np.int64, copy=False), mask_flat, bounds)
        if counts is not None:
            return int(counts.sum()), counts
    except Exception:
        pass
    u = np.unique(flat_ids[mask_flat > 0])
    edges = np.searchsorted(u, np.asarray(bounds))
    counts = np.diff(np.concatenate([[0], edges]))
    return len(u), counts


def _stream_epochs(ds, state, batch_size, epochs, seed, cap_mult, cap_max,
                   step_for, keys, int_keys, log, part_bounds=None):
    """Drive a fused one-dispatch streaming trainer.

    Small datasets (<= EPOCH_SCAN_MAX_POSITIONS stacked positions) run
    each epoch as ONE dispatched lax.scan over the stacked minibatches
    (fm_kernel.make_streaming_epoch_scan) — per-batch dispatch over a
    tunneled backend measured 11 ms/step at the reference-NFM regime
    where device compute is ~1 ms. Larger datasets stream per batch
    through the Prefetcher thread (which also counts uniques for the
    auto-capacity octaves, _capacity_octave)."""
    np_rng = np.random.default_rng(seed)
    positions = len(ds) * ds.ids.shape[1]
    epoch_losses = []

    # the partitioned master streams per batch only (the epoch-scan path
    # targets small datasets, where the packed layout is the right one)
    if part_bounds is None and positions <= EPOCH_SCAN_MAX_POSITIONS:
        # the whole run as ONE program: dataset on device once, epochs
        # shuffled and streamed in-graph (fm_kernel.make_streaming_run)
        n = len(ds)
        n_pad = -(-n // batch_size) * batch_size
        nu_total = _count_unique(ds.ids.reshape(-1), ds.mask.reshape(-1))
        cap = _capacity_octave(min(nu_total, batch_size * ds.ids.shape[1]),
                               cap_mult, cap_max)

        def padded(k):
            if k == "row_mask":
                a = np.ones((n,), np.float32)
            else:
                a = np.asarray(getattr(ds, k))
            if k in int_keys:
                a = a.astype(np.int32)
            if a.shape[0] < n_pad:
                pad_shape = (n_pad - n,) + a.shape[1:]
                a = np.concatenate(
                    [a, np.zeros(pad_shape, a.dtype)], axis=0)
            return jnp.asarray(a)

        arrays = tuple(padded(k) for k in keys)
        run = fm_kernel.make_streaming_run(step_for(cap), n_pad,
                                           batch_size, epochs)
        state, means = run(state, arrays,
                           jax.random.PRNGKey(np_rng.integers(2**31)))
        epoch_losses = [float(m) for m in np.asarray(means)]
        if log:
            for epoch, l in enumerate(epoch_losses):
                log(f"epoch {epoch}: loss={l:.5f}")
        return state, epoch_losses

    def place(b):
        ids = b["ids"].astype(np.int32)
        arrays = tuple(
            jnp.asarray(b[k].astype(np.int32)) if k in int_keys
            else jnp.asarray(b[k])
            for k in keys)
        if part_bounds is not None:
            # partitioned master: per-partition octave caps from ONE
            # native hash-set pass (Prefetcher thread, like the count)
            flat = np.asarray(ids).reshape(-1)
            m = np.asarray(b["mask"]).reshape(-1)
            nu, counts = _partition_unique_counts(flat, m, part_bounds)
            cap = _capacity_octave(nu, cap_mult, cap_max)
            return (cap, _partition_caps_octave_counts(counts)), arrays
        nu = _count_unique(ids, b["mask"])        # Prefetcher thread
        return _capacity_octave(nu, cap_mult, cap_max), arrays

    pf = Prefetcher(
        lambda ep: sparse_batches(ds, batch_size, rng=np_rng), placer=place
    )
    for epoch in range(epochs):
        losses = []
        for cap, b in pf.epoch(epoch):
            state, loss = step_for(cap)(state, *b)
            losses.append(loss)
        epoch_losses.append(float(jnp.mean(jnp.stack(losses))))
        if log:
            log(f"epoch {epoch}: loss={epoch_losses[-1]:.5f}")
    return state, epoch_losses


def _count_unique(ids, mask) -> int:
    """Exact unique masked-in id count for the capacity octaves. Uses
    the native hash-set counter (csrc/plan_server.cpp lc_count_unique,
    O(n)) when the library is present; numpy's sort-based unique is the
    fallback and the reference implementation (tests/test_plan_native.py
    pins equality)."""
    flat = np.asarray(ids).reshape(-1)
    m = np.asarray(mask).reshape(-1)
    try:
        from lightctr_tpu.data.native import count_unique_native

        nu = count_unique_native(flat.astype(np.int64), m)
        if nu is not None:
            return nu
    except Exception:
        pass
    return len(np.unique(flat[m > 0]))


def _capacity_octave(n_unique: int, mult: int, cap_max: int) -> int:
    """Smallest mult * 2^k >= n_unique + TILE + 1, capped at cap_max —
    octave-bucketed capacity selection for the streaming planners (the
    GBM grower's _slot_bucket pattern applied to the rank space):
    skewed traffic batches run at a capacity sized to their OBSERVED
    unique count instead of the worst-case B*L, and recompiles are
    bounded to one per octave. The unique count is exact (counted on
    the Prefetcher thread, off the device critical path), so overflow
    is impossible — a denser batch simply escalates to the next octave.
    Reference analogue: the PS pull set is sized per batch
    (/root/reference/LightCTR/distribut/pull.h:50-67)."""
    need = n_unique + TILE + 1
    cap = mult
    while cap < need and cap < cap_max:
        cap *= 2
    return min(cap, cap_max)


def train_fm_kernel(ds, factor=8, learning_rate=0.05, l2=0.0, epochs=5,
                    batch_size=256, seed=0, exact=True, log=print,
                    wide_optimizer="adagrad", fine=True, xmat=True,
                    mesh=None, wire="f32", partitioned=False):
    """-> (params dict {w0,w,v}, per-epoch mean losses).

    Full-batch runs the design-matrix step by default (xmat=True: every
    gather/scatter/row-reduce as dense matmuls against the plan-constant
    Crow/Crow2 count matrices — 0.49 ms vs the 5x128-window kernels'
    2.13 ms, numerically identical, PARITY.md). Streaming minibatches use
    the fine-window Pallas kernels (fine=True), where the rank space is
    too large to densify.

    mesh: a (data, model) jax Mesh routes training to the sharded
    streaming trainers (parallel/sharded_kernel.py) — master tables
    row-sharded over `model` (the PS capability), positions over `data`
    when the data axis is >1."""
    if mesh is not None:
        return _train_fm_kernel_sharded(
            ds, mesh, factor=factor, learning_rate=learning_rate, l2=l2,
            epochs=epochs, batch_size=batch_size, seed=seed, exact=exact,
            log=log, wire=wire,
        )
    assert wire == "f32", "wire compression applies to sharded (--mesh) runs"

    rng = jax.random.PRNGKey(seed)
    epoch_losses = []

    full_batch = batch_size >= len(ds)
    if full_batch:
        use_xmat = xmat
    else:
        # streaming xmat densifies the batch into [b_pad, capacity] count
        # matrices — only profitable/feasible when that fits comfortably
        # (production-scale capacities go to the fine-window kernels)
        capacity, b_pad = _streaming_dims(ds, batch_size, fine=fine)
        use_xmat = xmat and 2 * b_pad * capacity * 4 <= XMAT_STREAM_MAX_BYTES
    cfg = fm_kernel.KernelFMConfig(
        n_features=ds.n_features, factor=factor, learning_rate=learning_rate,
        l2=l2, exact=exact, wide_optimizer=wide_optimizer,
        interpret=_interpret(), fine=fine and not use_xmat,
        xmat=use_xmat,
    )

    if full_batch:
        # full-batch: one plan, zero per-step planning cost
        plan = fm_kernel.plan_batch(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels,
            fine=cfg.fine
        )
        state = fm_kernel.init(rng, cfg, plan)
        step = fm_kernel.make_train_step(cfg, plan)
        # all epochs in ONE dispatched scan — per-step dispatch costs more
        # than the xmat step itself on tunneled backends
        state, losses = fm_kernel.make_multi_step(step, epochs)(state)
        epoch_losses = [float(l) for l in np.asarray(losses)]
        if log:
            for epoch, l in enumerate(epoch_losses):
                log(f"epoch {epoch}: loss={l:.5f}")
        w0, w, v = fm_kernel.export_tables(state, plan, cfg)
        return {"w0": jnp.asarray(w0), "w": jnp.asarray(w),
                "v": jnp.asarray(v)}, epoch_losses

    # packed [V, 32] master layout (one row-gather + one row-scatter per
    # step; +52% at 10M vocab) with the FUSED one-dispatch step: device
    # planning traced INTO the train step, so each raw [B, L] batch costs
    # a single program dispatch — 4.2 ms vs 7.5 ms for separate
    # plan + step at B=256 (PARITY.md). The Prefetcher thread now only
    # stages host->device transfers.
    # partitioned: range-PARTITIONED master — skewed production traffic's
    # hot head pays small-table scatter rates (PARITY.md partitioned-
    # master row); per-batch octave caps come from the Prefetcher thread
    # so the step's overflow flag can never fire. Opt-in (CLI
    # --partitioned): uniform traffic is cold-partition-bound where the
    # split buys nothing.
    part_bounds = _partition_bounds(ds.n_features) if partitioned else None
    if part_bounds is not None and len(part_bounds) < 2:
        part_bounds = None                       # vocab too small to split

    # BINARY wire (r5): fixed-L all-ones datasets (standard binary-CTR
    # traffic) whose epochs split into FULL batches ship ids+labels only
    # — vals/mask/row_mask are synthesized in-graph
    # (make_streaming_train_step_fused_partitioned_binary). The honest
    # e2e production row measured this 2.0x the general wire on the
    # tunneled stack (bench.py production_zipf_e2e_binary_*).
    binary = (
        part_bounds is not None
        and len(ds) % batch_size == 0
        and bool(np.all(np.asarray(ds.mask) == 1.0))
        and bool(np.all(np.asarray(ds.vals) == 1.0))
    )

    state = fm_kernel.streaming_init_packed(rng, cfg)
    if part_bounds is not None:
        state = fm_kernel.partition_streaming_state(state, part_bounds)
    # auto-capacity octaves: one compiled step per observed octave
    # (tests/test_auto_capacity.py: trajectories are capacity-invariant)
    cap_mult = 5120 if cfg.fine else 2 * TILE
    steps: dict = {}

    def step_for(key):
        if key not in steps:
            if isinstance(key, tuple):
                cap, caps = key
                maker = (
                    fm_kernel
                    .make_streaming_train_step_fused_partitioned_binary
                    if binary else
                    fm_kernel.make_streaming_train_step_fused_partitioned)
                inner = maker(cfg, cap, b_pad, part_bounds, caps)

                def run(state, *b, _inner=inner):
                    # caps are derived from each batch's true counts
                    # (place()), so overflow is impossible here
                    (state, loss), _overflow = _inner(state, *b)
                    return state, loss

                steps[key] = run
            else:
                steps[key] = fm_kernel.make_streaming_train_step_fused(
                    cfg, key, b_pad)
        return steps[key]

    state, epoch_losses = _stream_epochs(
        ds, state, batch_size, epochs, seed, cap_mult, capacity, step_for,
        keys=(("ids", "labels") if binary
              else ("ids", "vals", "mask", "labels", "row_mask")),
        int_keys=("ids",), log=log, part_bounds=part_bounds)
    if part_bounds is not None:
        state = fm_kernel.departition_streaming_state(state)
    table = np.asarray(fm_kernel.unpack_streaming_state(state).table)
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(table[:, 0]),
        "v": jnp.asarray(table[:, 1 : 1 + factor]),
    }, epoch_losses


def _train_fm_kernel_sharded(ds, mesh, factor, learning_rate, l2, epochs,
                             batch_size, seed, exact, log, wire="f32"):
    """Sharded kernel FM. A DATA-only mesh (--mesh Nx1) + full batch
    runs the headline design-matrix step sharded over the batch rows
    (make_xmat_sharded_train_step — the reference's full-batch
    Ring-AllReduce regime). Otherwise: streaming over the (data, model)
    mesh, master table row-sharded over `model` (pull/compute/push cycle
    of parallel/sharded_kernel.py — the PS-replacement capability), the
    sorted position space sharded over `data` when >1. Losses match the
    single-device trajectories (tests/test_sharded_kernel.py)."""
    from ..parallel.sharded_kernel import (
        make_dp_sharded_streaming_step,
        make_sharded_streaming_step,
        shard_plan,
        shard_streaming_state,
    )
    from ..parallel.sharding import round_up_vocab

    M = mesh.shape["model"]
    Dd = mesh.shape["data"]
    batch_size = min(batch_size, len(ds))
    # cheap pre-check (mirrors plan_batch's b_pad law) BEFORE the
    # expensive host-side plan build
    b_pad_full = max((len(ds) + 127) // 128 * 128, 128)
    if M == 1 and batch_size >= len(ds) and b_pad_full % Dd == 0:
        # data-only mesh + full batch: the headline design-matrix step
        # sharded over `data` (count matrices batch-row-sharded, ONE
        # rank-space psum per step) — the product path for the
        # reference's full-batch Ring-AllReduce regime
        from ..parallel.sharded_kernel import make_xmat_sharded_train_step

        cfg = fm_kernel.KernelFMConfig(
            n_features=ds.n_features, factor=factor,
            learning_rate=learning_rate, l2=l2, exact=exact,
            interpret=_interpret(), xmat=True,
        )
        plan = fm_kernel.plan_batch(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels
        )
        assert plan.b_pad == b_pad_full, (plan.b_pad, b_pad_full)
        state = fm_kernel.init(jax.random.PRNGKey(seed), cfg, plan)
        step = make_xmat_sharded_train_step(cfg, plan, mesh, wire=wire)
        state, losses = fm_kernel.make_multi_step(step, epochs)(state)
        epoch_losses = [float(l) for l in np.asarray(losses)]
        if log:
            for epoch, l in enumerate(epoch_losses):
                log(f"epoch {epoch}: loss={l:.5f}")
        state = jax.device_get(state)
        w0, w, v = fm_kernel.export_tables(state, plan, cfg)
        return {"w0": jnp.asarray(w0), "w": jnp.asarray(w),
                "v": jnp.asarray(v)}, epoch_losses
    if M == 1 and batch_size >= len(ds) and log:
        # tell the user the requested full-batch data-sharded path was
        # not taken (batch pad does not divide the data axis)
        log(f"mesh data axis {Dd} does not divide the padded batch "
            f"{b_pad_full}; training through the streaming trainer")
    V = round_up_vocab(ds.n_features, max(1024, M))
    capacity, b_pad = _streaming_dims(ds, batch_size, fine=True)
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=factor, learning_rate=learning_rate, l2=l2,
        exact=exact, fine=True, interpret=_interpret(),
    )
    state = shard_streaming_state(
        fm_kernel.streaming_init(jax.random.PRNGKey(seed), cfg), mesh
    )
    if Dd > 1:
        step = make_dp_sharded_streaming_step(cfg, capacity, b_pad,
                                              mesh, wire=wire)
        n_pad_multiple = Dd * TILE
    else:
        step = make_sharded_streaming_step(cfg, capacity, b_pad, mesh,
                                           wire=wire)
        n_pad_multiple = None

    np_rng = np.random.default_rng(seed)

    def place(b):
        arrays = fm_kernel.plan_batch_on_device(
            jnp.asarray(b["ids"].astype(np.int32)), jnp.asarray(b["vals"]),
            jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=b_pad,
            n_pad_multiple=n_pad_multiple,
        )
        return shard_plan(arrays, mesh) if Dd > 1 else arrays

    pf = Prefetcher(
        lambda ep: sparse_batches(ds, batch_size, rng=np_rng), placer=place
    )
    epoch_losses = []
    for epoch in range(epochs):
        losses = []
        for b in pf.epoch(epoch):
            state, loss = step(state, b)
            losses.append(loss)
        epoch_losses.append(float(jnp.mean(jnp.stack(losses))))
        if log:
            log(f"epoch {epoch}: loss={epoch_losses[-1]:.5f}")
    table = np.asarray(jax.device_get(state.table))
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(table[:, 0]),
        "v": jnp.asarray(table[:, 1 : 1 + factor]),
    }, epoch_losses


def train_nfm_kernel(ds, factor=8, hidden=(64,), learning_rate=0.05,
                     mlp_learning_rate=1e-3, l2=0.0, epochs=5,
                     batch_size=256, seed=0, exact=True, log=print,
                     fine=True, xmat=True, mesh=None, wire="f32",
                     activation="relu", mlp_optimizer="adam",
                     partitioned=False):
    """-> (params dict {w0,w,v,mlp} for models/nfm, per-epoch losses).

    Full-batch (batch_size >= rows) runs the design-matrix step
    (xmat=True, see train_fm_kernel); minibatches stream through the
    fine-window kernels. mesh: model-axis-sharded streaming trainer
    (tables sharded, MLP tower replicated in lockstep).
    partitioned: range-PARTITIONED packed master (the FM production
    path generalised — nfm_kernel.make_streaming_train_step_partitioned,
    468.8k ex/s at the 10M-vocab zipf regime, PARITY.md)."""
    if mesh is not None:
        return _train_nfm_kernel_sharded(
            ds, mesh, factor=factor, hidden=tuple(hidden),
            learning_rate=learning_rate, mlp_learning_rate=mlp_learning_rate,
            l2=l2, epochs=epochs, batch_size=batch_size, seed=seed,
            exact=exact, log=log, wire=wire,
        )
    assert wire == "f32", "wire compression applies to sharded (--mesh) runs"

    full_batch = batch_size >= len(ds)
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=ds.n_features, factor=factor, hidden=tuple(hidden),
        activation=activation, mlp_optimizer=mlp_optimizer,
        learning_rate=learning_rate, mlp_learning_rate=mlp_learning_rate,
        l2=l2, exact=exact, interpret=_interpret(),
        fine=fine and not (full_batch and xmat), xmat=xmat and full_batch,
    )
    rng = jax.random.PRNGKey(seed)

    if full_batch:
        plan = fm_kernel.plan_batch(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.labels,
            fine=cfg.fine
        )
        state = nfm_kernel.init(rng, cfg, plan)
        step = nfm_kernel.make_train_step(cfg, plan)
        state, losses = fm_kernel.make_multi_step(step, epochs)(state)
        epoch_losses = [float(l) for l in np.asarray(losses)]
        if log:
            for epoch, l in enumerate(epoch_losses):
                log(f"epoch {epoch}: loss={l:.5f}")
        return nfm_kernel.export_tables(state, plan, cfg), epoch_losses

    batch_size = min(batch_size, len(ds))
    capacity, b_pad = _streaming_dims(ds, batch_size, fine=fine)
    part_bounds = _partition_bounds(ds.n_features) if partitioned else None
    if part_bounds is not None and len(part_bounds) < 2:
        part_bounds = None                       # vocab too small to split
    # BINARY wire (see train_fm_kernel): all-ones fixed-L datasets with
    # full batches ship ids+labels only through the partitioned path
    binary = (
        part_bounds is not None
        and len(ds) % batch_size == 0
        and bool(np.all(np.asarray(ds.mask) == 1.0))
        and bool(np.all(np.asarray(ds.vals) == 1.0))
    )
    if part_bounds is not None:
        state = nfm_kernel.partition_streaming_state(
            nfm_kernel.streaming_init_packed(rng, cfg), part_bounds)
    else:
        state = nfm_kernel.streaming_init(rng, cfg)
    # fused ONE-dispatch step: planning traced into the train step (see
    # train_fm_kernel); the Prefetcher stages transfers only. Capacity
    # picks per-batch octaves (_capacity_octave).
    cap_mult = 5120 if cfg.fine else 2 * TILE
    steps: dict = {}

    def step_for(key):
        if key not in steps:
            if isinstance(key, tuple):
                cap, caps = key
                maker = (
                    nfm_kernel
                    .make_streaming_train_step_fused_partitioned_binary
                    if binary else
                    nfm_kernel.make_streaming_train_step_fused_partitioned)
                inner = maker(cfg, cap, b_pad, part_bounds, caps)

                def run(state, *b, _inner=inner):
                    # caps from each batch's true counts: no overflow
                    (state, loss), _overflow = _inner(state, *b)
                    return state, loss

                steps[key] = run
            else:
                steps[key] = nfm_kernel.make_streaming_train_step_fused(
                    cfg, key, b_pad)
        return steps[key]

    state, epoch_losses = _stream_epochs(
        ds, state, batch_size, epochs, seed, cap_mult, capacity, step_for,
        keys=(("ids", "labels") if binary
              else ("ids", "vals", "mask", "labels", "row_mask")),
        int_keys=("ids",), log=log, part_bounds=part_bounds)
    if part_bounds is not None:
        state = nfm_kernel.unpack_streaming_state(
            nfm_kernel.departition_streaming_state(state))
    return nfm_kernel.export_streaming_params(state, cfg), epoch_losses


def _train_nfm_kernel_sharded(ds, mesh, factor, hidden, learning_rate,
                              mlp_learning_rate, l2, epochs, batch_size,
                              seed, exact, log, wire="f32"):
    """Streaming kernel NFM over the `model` mesh axis: table pull/push
    sharded, MLP tower replicated (deterministic lockstep Adam —
    parallel/sharded_kernel.make_sharded_streaming_nfm_step)."""
    from ..parallel.sharded_kernel import (
        make_dp_sharded_streaming_nfm_step,
        make_sharded_streaming_nfm_step,
        shard_plan,
        shard_streaming_nfm_state,
    )
    from ..parallel.sharding import round_up_vocab

    M = mesh.shape["model"]
    Dd = mesh.shape.get("data", 1)
    V = round_up_vocab(ds.n_features, max(1024, M))
    batch_size = min(batch_size, len(ds))
    capacity, b_pad = _streaming_dims(ds, batch_size, fine=True)
    cfg = nfm_kernel.KernelNFMConfig(
        n_features=V, factor=factor, hidden=tuple(hidden),
        learning_rate=learning_rate, mlp_learning_rate=mlp_learning_rate,
        l2=l2, exact=exact, fine=True, interpret=_interpret(),
    )
    state = shard_streaming_nfm_state(
        nfm_kernel.streaming_init(jax.random.PRNGKey(seed), cfg), mesh
    )
    if Dd > 1:
        # 2-D data x model: positions over `data`, table over `model`
        step = make_dp_sharded_streaming_nfm_step(cfg, capacity, b_pad,
                                                  mesh, wire=wire)
        n_pad_multiple = Dd * TILE
    else:
        step = make_sharded_streaming_nfm_step(cfg, capacity, b_pad,
                                               mesh, wire=wire)
        n_pad_multiple = None
    np_rng = np.random.default_rng(seed)

    def place(b):
        arrays = fm_kernel.plan_batch_on_device(
            jnp.asarray(b["ids"].astype(np.int32)), jnp.asarray(b["vals"]),
            jnp.asarray(b["mask"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["row_mask"]), capacity=capacity, b_pad=b_pad,
            n_pad_multiple=n_pad_multiple,
        )
        return shard_plan(arrays, mesh) if Dd > 1 else arrays

    pf = Prefetcher(
        lambda ep: sparse_batches(ds, batch_size, rng=np_rng), placer=place
    )
    epoch_losses = []
    for epoch in range(epochs):
        losses = []
        for b in pf.epoch(epoch):
            state, loss = step(state, b)
            losses.append(loss)
        epoch_losses.append(float(jnp.mean(jnp.stack(losses))))
        if log:
            log(f"epoch {epoch}: loss={epoch_losses[-1]:.5f}")
    state = jax.device_get(state)
    return nfm_kernel.export_streaming_params(state, cfg), epoch_losses


def train_ffm_kernel(ds, factor=4, learning_rate=0.05, l2=0.0, epochs=5,
                     seed=0, exact=True, agg=True, log=print, mesh=None,
                     batch_size=None, wire="f32"):
    """Kernel FFM -> (params dict {w0,w,v}, per-epoch losses).

    Full-batch by default (the reference FFM regime) on the count-matrix
    engine (agg=True) — the grouped field-blocked layout when ids
    partition into fields (PARITY.md; vs the one-hot sweep's 43.1 ms) and
    plain XLA, so CPU runs don't pay interpret-mode Pallas; agg=False
    keeps the sweep. exact=True default: fp32 measures FASTER than bf16
    on this engine (6.45 vs 7.19 ms — the casts cost more than they save)
    and is fp32-faithful.
    batch_size (< dataset rows): minibatch-streaming against the
    vocab-space master table via the fused ONE-dispatch step
    (ffm_kernel.make_streaming_train_step_fused — device planning traced
    into the train step) — the PS-scale regime where the working set
    can't densify full-batch.
    mesh: model-axis-sharded streaming trainer (the FFM master table is
    (1+F*K)-wide per row — the largest per-chip memory win from shards)."""
    if mesh is not None:
        return _train_ffm_kernel_sharded(
            ds, mesh, factor=factor, learning_rate=learning_rate, l2=l2,
            epochs=epochs, seed=seed, exact=exact, agg=agg, log=log,
            wire=wire,
        )
    assert wire == "f32", "wire compression applies to sharded (--mesh) runs"

    if batch_size is not None and batch_size < len(ds):
        return _train_ffm_kernel_streaming(
            ds, factor=factor, learning_rate=learning_rate, l2=l2,
            epochs=epochs, batch_size=batch_size, seed=seed, exact=exact,
            agg=agg, log=log,
        )
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=ds.n_features, n_fields=ds.n_fields, factor=factor,
        learning_rate=learning_rate, l2=l2, exact=exact, agg=agg,
        interpret=_interpret(),
    )
    if agg:
        # grouped field-blocked layout when the ids partition into
        # fields: the count-matrix product is block diagonal in (field,
        # rank) — one 'bfr,frd->bfd' einsum per field-size group, each
        # field padded only to its group's largest unique count (6.9x
        # fewer table rows than one-block on the bundled data's skew;
        # PARITY.md). Gated on the WHOLE working set (the dominant term
        # is the two [B, rows_total] count matrices, not the table).
        gplan = ffm_kernel.plan_batch_grouped(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields,
            ds.labels, n_fields=ds.n_fields,
        )
        if gplan is not None:
            Dwa = ffm_kernel.grouped_row_width(cfg, gplan)
            A = gplan.n_active
            # working set: 2 count matrices [B, rows_total] + table/accum
            # [rows_total, Dwa] + fwd/bwd activations (S [B, A, Dwa] and
            # the pairwise P [B, A, A, Kf], live twice through autodiff)
            grp_bytes = 4 * (
                2 * gplan.n_rows_total * (len(ds) + Dwa)
                + 2 * len(ds) * A * (Dwa + 2 * A * factor)
            )
            if grp_bytes <= FFM_BLOCKED_MAX_BYTES:
                state = ffm_kernel.init_grouped(jax.random.PRNGKey(seed),
                                                cfg, gplan)
                step = ffm_kernel.make_train_step_grouped(cfg, gplan)
                state, losses = fm_kernel.make_multi_step(step,
                                                          epochs)(state)
                epoch_losses = [float(l) for l in np.asarray(losses)]
                if log:
                    for epoch, l in enumerate(epoch_losses):
                        log(f"epoch {epoch}: loss={l:.5f}")
                return ffm_kernel.export_params_grouped(state, gplan,
                                                        cfg), epoch_losses
            # over budget: the flat count-matrix engine's C [B*F, R] is
            # strictly LARGER — go to the dense Pallas sweep instead
            # (table [R, Dw] + positions only, no densified batch).
            # EXCEPT off-TPU: the sweep would run interpret-mode Pallas
            # (a crawl), and host RAM comfortably holds the flat C — the
            # budget guards HBM, not host memory.
            if not _interpret():
                cfg = dataclasses.replace(cfg, agg=False)
    plan = ffm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels
    )
    state = ffm_kernel.init(jax.random.PRNGKey(seed), cfg, plan)
    step = ffm_kernel.make_train_step(cfg, plan)
    state, losses = fm_kernel.make_multi_step(step, epochs)(state)
    epoch_losses = [float(l) for l in np.asarray(losses)]
    if log:
        for epoch, l in enumerate(epoch_losses):
            log(f"epoch {epoch}: loss={l:.5f}")
    return ffm_kernel.export_params(state, plan, cfg), epoch_losses


def _fields_partition(ds) -> bool:
    """True iff every feature id carries ONE field across the dataset —
    the standard libffm property that enables the rank-field self-term
    engine (ffm_kernel._logits_from_counts_rf). One O(nnz) host pass."""
    flat_ids = ds.ids.reshape(-1)
    flat_f = ds.fields.reshape(-1)
    valid = ds.mask.reshape(-1) > 0
    fid = np.full((ds.n_features,), -1, np.int64)
    fid[flat_ids[valid]] = flat_f[valid]
    return bool(np.all(fid[flat_ids[valid]] == flat_f[valid]))


def _train_ffm_kernel_streaming(ds, factor, learning_rate, l2, epochs,
                                batch_size, seed, exact, agg, log):
    """Minibatch-streaming kernel FFM: vocab-space master table, fused
    one-dispatch step (device planning traced into the train step), the
    Prefetcher thread staging host->device transfers — the same cycle as
    the FM/NFM streaming engines. Reference capability: FFM at PS scale
    (paramserver.h sharded KV); here one chip streams against the
    HBM-resident master."""
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=ds.n_features, n_fields=ds.n_fields, factor=factor,
        learning_rate=learning_rate, l2=l2, exact=exact, agg=agg,
        interpret=_interpret(),
    )
    L = ds.ids.shape[1]
    max_uniques = min(batch_size * L, ds.n_features)
    capacity = _round_up(max_uniques + 2, 2 * TILE)
    fp = agg and _fields_partition(ds)

    state = ffm_kernel.streaming_init(jax.random.PRNGKey(seed), cfg)
    # auto-capacity octaves (see _capacity_octave): skewed batches run
    # at their observed unique count, not the B*L worst case
    steps: dict = {}

    def step_for(cap):
        if cap not in steps:
            steps[cap] = ffm_kernel.make_streaming_train_step_fused(
                cfg, cap, fields_partition=fp)
        return steps[cap]

    state, epoch_losses = _stream_epochs(
        ds, state, batch_size, epochs, seed, 2 * TILE, capacity, step_for,
        keys=("ids", "vals", "mask", "fields", "labels", "row_mask"),
        int_keys=("ids", "fields"), log=log)
    return ffm_kernel.export_streaming_params(state, cfg), epoch_losses


def _train_ffm_kernel_sharded(ds, mesh, factor, learning_rate, l2, epochs,
                              seed, exact, agg, log, wire="f32"):
    """Sharded FFM: a DATA-only mesh (--mesh Nx1) runs the grouped
    active-width full-batch step sharded over the batch rows (the
    0.6 ms headline trainer scaled out, make_grouped_sharded_ffm_step);
    a MODEL-only mesh (--mesh 1xM) runs the streaming vocab-master
    trainer (sharded pull/compute/push — the PS capability) fed the
    full batch each epoch, same trajectory as the full-batch step on
    touched rows (tests/test_ffm_streaming.py / test_sharded_kernel.py)."""
    from ..parallel.sharded_kernel import (
        make_grouped_sharded_ffm_step,
        make_sharded_streaming_ffm_step,
        shard_streaming_ffm_state,
    )
    from ..parallel.sharding import round_up_vocab

    M = mesh.shape["model"]
    Dd = mesh.shape.get("data", 1)
    if M == 1:
        gplan = ffm_kernel.plan_batch_grouped(
            ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields,
            ds.labels, n_fields=ds.n_fields,
        ) if agg else None
        cfg = ffm_kernel.KernelFFMConfig(
            n_features=ds.n_features, n_fields=ds.n_fields,
            factor=factor, learning_rate=learning_rate, l2=l2,
            exact=exact, agg=True, interpret=_interpret(),
        )
        ok = gplan is not None and len(ds) % Dd == 0
        if ok:
            # PER-DEVICE working set: count matrices + activations are
            # batch-sharded (1/Dd each), table/accum replicate
            Dwa = ffm_kernel.grouped_row_width(cfg, gplan)
            A = gplan.n_active
            Bl = len(ds) // Dd
            ok = 4 * (2 * gplan.n_rows_total * (Bl + Dwa)
                      + 2 * Bl * A * (Dwa + 2 * A * factor)
                      ) <= FFM_BLOCKED_MAX_BYTES
        if ok:
            state = ffm_kernel.init_grouped(jax.random.PRNGKey(seed), cfg,
                                            gplan)
            step = make_grouped_sharded_ffm_step(cfg, gplan, mesh,
                                                 wire=wire)
            state, losses = fm_kernel.make_multi_step(step, epochs)(state)
            epoch_losses = [float(l) for l in np.asarray(losses)]
            if log:
                for epoch, l in enumerate(epoch_losses):
                    log(f"epoch {epoch}: loss={l:.5f}")
            state = jax.device_get(state)
            return ffm_kernel.export_params_grouped(state, gplan,
                                                    cfg), epoch_losses
        # preconditions failed (ambiguous fields, Dd does not divide the
        # batch, over budget, or agg=False): train unsharded rather than
        # erroring — the full batch was host-resident to plan anyway
        if log:
            log(f"data mesh {Dd}x1: grouped sharded preconditions not "
                "met; training unsharded")
        return train_ffm_kernel(ds, factor=factor,
                                learning_rate=learning_rate, l2=l2,
                                epochs=epochs, seed=seed, exact=exact,
                                agg=agg, log=log, mesh=None)
    V = round_up_vocab(ds.n_features, max(1024, M))
    cfg = ffm_kernel.KernelFFMConfig(
        n_features=V, n_fields=ds.n_fields, factor=factor,
        learning_rate=learning_rate, l2=l2, exact=exact, agg=agg,
        interpret=_interpret(),
    )
    plan = ffm_kernel.plan_batch(
        ds.ids.astype(np.int64), ds.vals, ds.mask, ds.fields, ds.labels
    )
    capacity = plan.n_rows_pad
    state = shard_streaming_ffm_state(
        ffm_kernel.streaming_init(jax.random.PRNGKey(seed), cfg), mesh
    )
    # rank-field self-term when the dataset's ids partition into fields
    # (plan_batch detected it on the full batch — a dataset-level property)
    fp = plan.rank_field is not None
    if Dd > 1:
        # 2-D data x model: batch rows over `data`, table over `model`
        from ..parallel.sharded_kernel import (
            make_dp_sharded_streaming_ffm_step,
        )

        if len(ds) % Dd:
            raise ValueError(
                f"2-D sharded FFM needs the {len(ds)}-row batch divisible "
                f"by the data axis {Dd}")
        step = make_dp_sharded_streaming_ffm_step(
            cfg, capacity, mesh, fields_partition=fp, wire=wire)
    else:
        step = make_sharded_streaming_ffm_step(
            cfg, capacity, mesh, fields_partition=fp, wire=wire)
    arrays = ffm_kernel.plan_to_arrays(plan, capacity)
    epoch_losses = []
    for epoch in range(epochs):
        state, loss = step(state, arrays)
        epoch_losses.append(float(loss))
        if log:
            log(f"epoch {epoch}: loss={epoch_losses[-1]:.5f}")
    state = jax.device_get(state)
    return ffm_kernel.export_streaming_params(state, cfg), epoch_losses


def train_widedeep_kernel(ds, embed_dim=4, hidden=(50,),
                          learning_rate=0.05, mlp_learning_rate=1e-3,
                          l2=0.0, epochs=5, batch_size=256, seed=0,
                          exact=True, log=print, activation="tanh",
                          partitioned=False):
    """-> (params dict {w0,w,embed,mlp} for models/widedeep, per-epoch
    losses). Streaming vocab-master W&D (models/widedeep_kernel.py —
    the reference's PS-mode flagship at production scale): fused
    one-dispatch steps with per-batch capacity octaves; partitioned=True
    uses the range-partitioned master. The dense train_model path
    remains the right tool for small full-batch runs (107-212x the
    reference's PS cluster at the bundled regime, PARITY.md); this
    engine exists for vocab scales where the dense optimizer's
    full-table update is the bottleneck. NOTE the flat-agg count
    matrix is [B*n_fields, capacity] — keep batch_size*n_fields*capacity
    within HBM (B<=1024 at F=68/10M-vocab zipf; NEXT_STEPS shape math)."""
    from ..models import widedeep_kernel

    cfg = widedeep_kernel.KernelWDConfig(
        n_features=ds.n_features, n_fields=ds.n_fields,
        embed_dim=embed_dim, hidden=tuple(hidden), activation=activation,
        learning_rate=learning_rate, mlp_learning_rate=mlp_learning_rate,
        l2=l2, exact=exact, interpret=_interpret())
    batch_size = min(batch_size, len(ds))
    L = ds.ids.shape[1]
    cap_max = _round_up(min(batch_size * L, ds.n_features) + TILE + 1,
                        2 * TILE)
    rng = jax.random.PRNGKey(seed)
    part_bounds = _partition_bounds(ds.n_features) if partitioned else None
    if part_bounds is not None and len(part_bounds) < 2:
        part_bounds = None
    state = widedeep_kernel.streaming_init_packed(rng, cfg)
    if part_bounds is not None:
        state = widedeep_kernel.partition_streaming_state(state,
                                                          part_bounds)
    steps: dict = {}

    def step_for(key):
        if key not in steps:
            if isinstance(key, tuple):
                cap, caps = key
                inner = (widedeep_kernel
                         .make_streaming_train_step_fused_partitioned(
                             cfg, cap, part_bounds, caps))

                def run(state, *b, _inner=inner):
                    (state, loss), _overflow = _inner(state, *b)
                    return state, loss

                steps[key] = run
            else:
                steps[key] = widedeep_kernel.make_streaming_train_step_fused(
                    cfg, key)
        return steps[key]

    state, epoch_losses = _stream_epochs(
        ds, state, batch_size, epochs, seed, 2 * TILE, cap_max, step_for,
        keys=("ids", "vals", "mask", "fields", "labels", "row_mask"),
        int_keys=("ids", "fields"), log=log, part_bounds=part_bounds)
    if part_bounds is not None:
        state = widedeep_kernel.departition_streaming_state(state)
    return widedeep_kernel.export_streaming_params(state, cfg), \
        epoch_losses


KERNEL_ENGINES = {
    "fm": train_fm_kernel,
    "nfm": train_nfm_kernel,
    "ffm": train_ffm_kernel,
    "widedeep": train_widedeep_kernel,
}
