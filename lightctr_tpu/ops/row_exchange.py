"""Pallas TPU kernels: vocab-scale master-table row exchange (pull/push).

THE last product hot path that ran on XLA primitives: the streaming
kernel trainers keep their master tables in vocab space ([V, W] with
V up to 10M+) and each step pulls the batch's unique rows into rank
space and pushes updated rows back — the direct TPU replacement of the
reference parameter server's hot pull/push loop
(/root/reference/LightCTR/distribut/pull.h:111-134,
paramserver.h:141-179). Measured on the v5e (PARITY.md,
benchmarks/bench_gather_cost.py): XLA's gather/scatter against a
10M-row table is per-ROW latency-bound — ~88 ns/row gather and
~145 ns/row scatter (260k rows -> 22.8 + 37.8 ms), i.e. ~1.4 GB/s
effective on a >800 GB/s HBM part. These kernels replace it with a
bandwidth-shaped design:

  The batch's unique ids are SORTED (the planner dedups by argsort), so
  the touched table rows group into ascending CHUNKS of C consecutive
  rows. A grid over touched-chunk slots lets the Pallas pipeline stream
  each [C, W] chunk HBM->VMEM (sequential DMAs at full bandwidth,
  double-buffered against compute), and a short in-VMEM copy loop moves
  the cnt_t touched rows between the chunk and the compact rank-space
  buffer. Pull reads chunks; push copies chunk->chunk (aliased in
  place) with touched rows overwritten, so untouched chunks are never
  moved at all.

  Worst case (uniform ids) this sweeps the touched portion of the
  table at HBM bandwidth; skewed (zipf) traffic touches few chunks and
  the cost collapses with it. Idle padding slots repeat the previous
  slot's chunk index, which the Pallas pipeline recognises as
  "block unchanged" and skips the DMA.

A second kernel family (`*_dma`) issues one small async copy per ROW,
pipelined NSLOT deep — the latency-hiding alternative when the batch
touches few rows of many distinct chunks. Both families are
numerics-identical to the XLA gather/scatter they replace
(tests/test_row_exchange.py); benchmarks/bench_row_exchange.py decides
which backs the production step.

Layout note: slot metadata rides in SMEM — chunk indices as scalar
prefetch (they drive the BlockSpec index maps), per-slot
[start, cnt, local row offsets...] as an SMEM-blocked meta row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Planner


def exchange_dims(n_features: int, capacity: int, chunk: int = 2048,
                  u_max: int = 256) -> tuple[int, int, int]:
    """Static (T_max, chunk, u_max) for plan_row_exchange: enough slots
    for every touchable chunk plus the sub-slot splits of dense chunks
    (a chunk holding more than u_max touched rows spans several slots)."""
    n_chunks = -(-n_features // chunk)
    t_max = min(n_chunks, capacity) + -(-capacity // u_max)
    return t_max, chunk, u_max


@functools.partial(jax.jit, static_argnames=("n_features", "capacity",
                                             "chunk", "u_max"))
def plan_row_exchange(uids, n_unique, *, n_features: int, capacity: int,
                      chunk: int = 2048, u_max: int = 256):
    """Slot metadata for the sweep kernels, built in-graph (it runs
    inside the fused streaming step next to the batch dedup).

    uids: [capacity] int32, ascending over the first n_unique entries
    (the dedup planners' output; the tail may hold anything).

    Returns (chunk_ids [T_max] int32, meta [T_max, 2 + u_max] int32)
    where meta[t] = [start_t, cnt_t, local row offsets of the slot's
    rows within its chunk...]. Invariants the kernels rely on:
      - chunk_ids is non-decreasing; padding slots repeat the last real
        chunk (so the pipeline skips their DMAs and an aliased push
        never re-fetches an already-written chunk)
      - slot ranges [start, start+cnt) tile [0, n_unique) contiguously
        in order
    """
    t_max, _, _ = exchange_dims(n_features, capacity, chunk, u_max)
    pos = jnp.arange(capacity, dtype=jnp.int32)
    valid = pos < n_unique
    n_chunks = -(-n_features // chunk)
    cid = jnp.where(valid, uids.astype(jnp.int32) // chunk, n_chunks)

    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), cid[:-1]])
    seg_start = jnp.logical_and(valid, cid != prev)
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1  # [capacity]

    # first position and count of each segment (touched chunk)
    seg_first = (
        jnp.zeros((t_max,), jnp.int32)
        .at[jnp.where(seg_start, seg_id, t_max)]
        .set(pos, mode="drop")
    )
    seg_cnt = (
        jnp.zeros((t_max,), jnp.int32)
        .at[jnp.where(valid, seg_id, t_max)]
        .add(1, mode="drop")
    )

    # split segments into sub-slots of <= u_max rows
    sub_per_seg = -(-seg_cnt // u_max)                       # ceil
    seg_base = jnp.cumsum(sub_per_seg) - sub_per_seg         # exclusive
    within = pos - seg_first[seg_id]
    slot = jnp.where(valid, seg_base[seg_id] + within // u_max, t_max)
    n_slots = jnp.sum(sub_per_seg)

    slot_chunk = (
        jnp.zeros((t_max,), jnp.int32).at[slot].set(cid, mode="drop")
    )
    slot_start = (
        jnp.zeros((t_max,), jnp.int32)
        .at[slot].set(pos - within % u_max, mode="drop")
    )
    slot_cnt = (
        jnp.zeros((t_max,), jnp.int32).at[slot].add(1, mode="drop")
    )

    # pad idle slots: repeat the last real chunk, zero-length range
    sidx = jnp.arange(t_max, dtype=jnp.int32)
    last_chunk = slot_chunk[jnp.maximum(n_slots - 1, 0)]
    chunk_ids = jnp.where(sidx < n_slots, slot_chunk, last_chunk)
    starts = jnp.where(sidx < n_slots, slot_start, n_unique)
    cnts = jnp.where(sidx < n_slots, slot_cnt, 0)

    locals_ = (
        jnp.zeros((t_max, u_max), jnp.int32)
        .at[slot, within % u_max]
        .set(jnp.where(valid, uids.astype(jnp.int32) - cid * chunk, 0),
             mode="drop")
    )
    meta = jnp.concatenate(
        [starts[:, None], cnts[:, None], locals_], axis=1
    )
    return chunk_ids, meta


# ---------------------------------------------------------------------------
# Sweep kernels (touched-chunk streaming)


def _pull_sweep_kernel(chunk_ids_ref, meta_ref, blk_ref, out_ref,
                       *, u_max: int, unroll: int):
    t = pl.program_id(0)
    start = meta_ref[0, 0]
    cnt = meta_ref[0, 1]

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    w = out_ref.shape[1]

    def body(k, _):
        base = k * unroll
        rows = [blk_ref[pl.ds(meta_ref[0, 2 + base + u], 1), :]
                for u in range(unroll)]
        out_ref[pl.ds(start + base, unroll), :] = (
            rows[0] if unroll == 1
            else jnp.concatenate(rows, axis=0)
        ).reshape(unroll, w)
        return 0

    # full unrolled groups, then the ragged tail one row at a time
    n_full = cnt // unroll
    jax.lax.fori_loop(0, n_full, body, 0)

    def tail(i, _):
        out_ref[pl.ds(start + i, 1), :] = (
            blk_ref[pl.ds(meta_ref[0, 2 + i], 1), :]
        )
        return 0

    jax.lax.fori_loop(n_full * unroll, cnt, tail, 0)


@functools.partial(
    jax.jit,
    static_argnames=("capacity", "chunk", "u_max", "unroll", "interpret"),
)
def pull_rows_sweep(packed, chunk_ids, meta, *, capacity: int,
                    chunk: int = 2048, u_max: int = 256, unroll: int = 8,
                    interpret: bool = False):
    """rows[r] = packed[uids[r]] for r < n_unique, 0 beyond — the "pull"
    half of the PS cycle as a touched-chunk sweep. packed: [V, W] (W a
    multiple the VPU likes — 16/32); chunk_ids/meta from
    plan_row_exchange built with the same capacity."""
    t_max, u = chunk_ids.shape[0], meta.shape[1] - 2
    assert u == u_max
    r_cap = capacity
    v, w = packed.shape
    kernel = functools.partial(_pull_sweep_kernel, u_max=u_max,
                               unroll=unroll)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, 2 + u_max), lambda t, c: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, w), lambda t, c: (c[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_cap, w), lambda t, c: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_cap, w), packed.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=r_cap * w * 4 + 8 * chunk * w * 4 + 2**20,
        ),
        interpret=interpret,
    )(chunk_ids, meta, packed)


def _push_sweep_kernel(chunk_ids_ref, meta_ref, rows_ref, blk_in_ref,
                       blk_out_ref, *, u_max: int):
    t = pl.program_id(0)
    start = meta_ref[0, 0]
    cnt = meta_ref[0, 1]

    # copy-through only on the FIRST slot of each chunk: later sub-slots
    # of the same chunk keep the block resident (no re-fetch), and the
    # copy would clobber their predecessors' row writes
    prev_t = jnp.maximum(t - 1, 0)
    is_first = jnp.logical_or(t == 0, chunk_ids_ref[t] != chunk_ids_ref[prev_t])

    @pl.when(is_first)
    def _():
        blk_out_ref[...] = blk_in_ref[...]

    def body(i, _):
        blk_out_ref[pl.ds(meta_ref[0, 2 + i], 1), :] = (
            rows_ref[pl.ds(start + i, 1), :]
        )
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_features", "chunk", "u_max", "interpret"),
    donate_argnums=(0,),
)
def push_rows_sweep(packed, rows, chunk_ids, meta, *, n_features: int,
                    chunk: int = 2048, u_max: int = 256,
                    interpret: bool = False):
    """packed[uids[r]] = rows[r] for r < n_unique — the "push" half
    (scatter-set; the streaming steps write fully-updated rows, which
    equals scatter-add because uids are unique). In-place: only touched
    chunks move (read + write back with rows overwritten); untouched
    chunks stay via input/output aliasing."""
    t_max = chunk_ids.shape[0]
    v, w = packed.shape
    r_cap = rows.shape[0]
    kernel = functools.partial(_push_sweep_kernel, u_max=u_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((1, 2 + u_max), lambda t, c: (t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r_cap, w), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, w), lambda t, c: (c[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, w), lambda t, c: (c[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, w), packed.dtype),
        input_output_aliases={3: 0},  # packed (after 1 scalar + 2 inputs)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=r_cap * w * 4 + 8 * chunk * w * 4 + 2**20,
        ),
        interpret=interpret,
    )(chunk_ids, meta, rows, packed)


# ---------------------------------------------------------------------------
# Per-row DMA kernels (latency-pipelined alternative)

NSLOT = 16


def _pull_dma_kernel(nuniq_ref, uids_ref, table_ref, out_ref, sems,
                     *, group: int):
    t = pl.program_id(0)
    base = t * group
    n_unique = nuniq_ref[0]

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def dma(i):
        uid = uids_ref[i]
        return pltpu.make_async_copy(
            table_ref.at[uid],
            out_ref.at[base + i],
            sems.at[jax.lax.rem(i, NSLOT)],
        )

    cnt = jnp.clip(n_unique - base, 0, group)

    def drain(i, _):
        dma(i).wait()
        return 0

    # issue with NSLOT outstanding: start i, and once i >= NSLOT wait
    # for (i - NSLOT) before reusing its semaphore slot
    def body(i, _):
        @pl.when(i >= NSLOT)
        def _():
            dma(i - NSLOT).wait()
        dma(i).start()
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)
    jax.lax.fori_loop(jnp.maximum(cnt - NSLOT, 0), cnt, drain, 0)


@functools.partial(
    jax.jit, static_argnames=("capacity", "group", "interpret"))
def pull_rows_dma(packed, uids, n_unique, *, capacity: int,
                  group: int = 512, interpret: bool = False):
    """rows[r] = packed[uids[r]] via one pipelined async copy per row
    (NSLOT outstanding). uids beyond n_unique are skipped; those output
    rows are zero."""
    v, w = packed.shape
    assert capacity % group == 0
    kernel = functools.partial(_pull_dma_kernel, group=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(capacity // group,),
        in_specs=[
            pl.BlockSpec((group,), lambda t, n: (t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((capacity, w), lambda t, n: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSLOT,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((capacity, w), packed.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=capacity * w * 4 + 2**22,
        ),
        interpret=interpret,
    )(jnp.asarray([n_unique], jnp.int32), uids.astype(jnp.int32), packed)


def _push_dma_kernel(nuniq_ref, uids_ref, rows_ref, table_in_ref,
                     table_out_ref, sems, *, group: int):
    t = pl.program_id(0)
    base = t * group
    n_unique = nuniq_ref[0]

    def dma(i):
        uid = uids_ref[i]
        return pltpu.make_async_copy(
            rows_ref.at[base + i],
            table_out_ref.at[uid],
            sems.at[jax.lax.rem(i, NSLOT)],
        )

    cnt = jnp.clip(n_unique - base, 0, group)

    def body(i, _):
        @pl.when(i >= NSLOT)
        def _():
            dma(i - NSLOT).wait()
        dma(i).start()
        return 0

    def drain(i, _):
        dma(i).wait()
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)
    jax.lax.fori_loop(jnp.maximum(cnt - NSLOT, 0), cnt, drain, 0)


@functools.partial(
    jax.jit, static_argnames=("group", "interpret"), donate_argnums=(0,))
def push_rows_dma(packed, rows, uids, n_unique, *, group: int = 512,
                  interpret: bool = False):
    """packed[uids[r]] = rows[r] via one pipelined async copy per row,
    writing straight into the (aliased, donated) master in HBM."""
    v, w = packed.shape
    capacity = rows.shape[0]
    assert capacity % group == 0
    kernel = functools.partial(_push_dma_kernel, group=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(capacity // group,),
        in_specs=[
            pl.BlockSpec((group,), lambda t, n: (t,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSLOT,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, w), packed.dtype),
        input_output_aliases={3: 0},  # packed (after 1 scalar + 2 inputs)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=capacity * w * 4 + 2**22,
        ),
        interpret=interpret,
    )(jnp.asarray([n_unique], jnp.int32), uids.astype(jnp.int32),
      rows, packed)
