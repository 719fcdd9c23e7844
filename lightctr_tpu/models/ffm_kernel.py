"""FFM trainer on the dense one-hot Pallas kernels (ops/ffm_pallas.py).

Capability lineage: the reference's FFM trainer
(/root/reference/LightCTR/train/train_ffm_algo.cpp:51-116) — full-batch
field-aware FM with the pairwise weight
``dot(V[f1,field2], V[f2,field1]) * x1 * x2`` and symmetric Adagrad
updates. TPU-native redesign:

  table [R, Dw]    rank-space rows packing [w | V(F*K) | pad] — only ids
                   touched by the batch are materialised (the "pull set"
                   of the reference's PS design), Dw lane-aligned.
  gather           ops/ffm_pallas.rank_lookup: one-hot MXU sweep, positions
                   stay in natural [B, L] order (no sort, host or device).
  pairwise math    exact field-aggregation rewrite as XLA einsums over
                   [B, L, F, K] (the same math ops/interactions.ffm_interaction
                   is tested against) — autodiff supplies the backward, and
                   the custom-vjp lookup turns de into a Pallas scatter-add.
  update           dense Adagrad on [R, Dw] (server-side-update analogue).

Trains in the reference's regime (full-batch per epoch,
train_fm_algo.cpp:38) with one compiled step reused every epoch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.ffm_pallas import RBLK, TILE, rank_lookup


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class KernelFFMConfig:
    n_features: int
    n_fields: int
    factor: int = 4
    learning_rate: float = 0.05
    init_std: float = 0.01
    l2: float = 0.0
    interpret: bool = False
    # exact=True runs the one-hot matmuls in fp32 (fp32-faithful; the
    # test/verification mode); False uses bf16 compute (fastest).
    exact: bool = True
    # agg=True replaces the dense one-hot rank sweep (rank_lookup +
    # scatter vjp, 2*n*R*Dw MACs — the 26 ms floor in PARITY.md's cost
    # analysis) with a count-matrix factorisation: positions are
    # pre-aggregated into C[(row, field), rank] by ONE scalar scatter-add
    # (n updates), and the field-aggregation tensor becomes a single MXU
    # matmul S = C @ table ((B*F)*R*Dw MACs — n/(B*F) ~ 5.6x fewer).
    # The backward is C^T @ dS via autodiff. Plain XLA, no Pallas.
    agg: bool = False

    @property
    def row_width(self) -> int:
        """Packed row: [w | V(n_fields*factor) | pad to lane multiple]."""
        return _round_up(1 + self.n_fields * self.factor, 128)


class KernelFFMState(NamedTuple):
    w0: jax.Array
    w0_accum: jax.Array
    table: jax.Array   # [R, Dw] packed [w | V(F*K) | pad] in rank space
    accum: jax.Array   # [R, Dw] adagrad accumulator


@dataclasses.dataclass
class FFMBatchPlan:
    """Batch tensors in natural [B, L] order + the rank mapping."""

    ranks: jax.Array       # [n_pad] int32, row-major; padding -> R-1
    xv: jax.Array          # [B, L] vals*mask
    fields: jax.Array      # [B, L] int32
    labels: jax.Array      # [B]
    row_mask: jax.Array    # [B]
    uids: np.ndarray       # [R] int64, uids[rank] = feature id (0-padded)
    n_unique: int
    n_rows_pad: int
    n_valid_rows: float
    # each rank's (single) field, when every occurrence of a feature id
    # carries the same field — true for standard libffm data, where a
    # feature belongs to exactly one field. Enables the rank-granular
    # self-term (see _logits_from_counts_rf). None when ambiguous.
    rank_field: np.ndarray | None = None


def plan_batch(ids, vals, mask, fields, labels, row_mask=None,
               n_rows_pad=None) -> FFMBatchPlan:
    """Host-side dedup only (np.unique) — NO sorting of positions: the
    dense-sweep kernels take ranks in natural order. Mirrors the reference
    worker's per-batch key-set build (distributed_algo_abst.h:181-190)."""
    B, L = ids.shape
    if row_mask is None:
        row_mask = np.ones((B,), np.float32)
    flat = ids.reshape(-1).astype(np.int64)
    valid = mask.reshape(-1) > 0
    uniq = np.unique(flat[valid])
    n_unique = len(uniq)
    if n_rows_pad is None:
        n_rows_pad = _round_up(n_unique + 1, RBLK)
    assert n_unique < n_rows_pad, (n_unique, n_rows_pad)
    pad_rank = n_rows_pad - 1
    ranks_bl = np.searchsorted(uniq, flat)
    ranks_bl = np.where(valid, ranks_bl, pad_rank).astype(np.int32)
    n_pad = _round_up(B * L, TILE)
    ranks = np.full((n_pad,), pad_rank, np.int32)
    ranks[: B * L] = ranks_bl
    uids = np.zeros((n_rows_pad,), np.int64)
    uids[:n_unique] = uniq
    # rank -> field map, defined iff every occurrence of a uid agrees on
    # its field (standard FFM: feature ids partition into fields)
    flat_f = fields.reshape(-1).astype(np.int32)
    rank_field = np.zeros((n_rows_pad,), np.int32)
    rank_field[ranks_bl[valid]] = flat_f[valid]
    unique_field = bool(
        np.all(rank_field[ranks_bl[valid]] == flat_f[valid])
    )
    return FFMBatchPlan(
        ranks=jnp.asarray(ranks),
        xv=jnp.asarray((vals * mask).astype(np.float32)),
        fields=jnp.asarray(fields.astype(np.int32)),
        labels=jnp.asarray(labels.astype(np.float32)),
        row_mask=jnp.asarray(row_mask.astype(np.float32)),
        uids=uids,
        n_unique=n_unique,
        n_rows_pad=n_rows_pad,
        n_valid_rows=float(row_mask.sum()),
        rank_field=rank_field if unique_field else None,
    )


def init(rng: jax.Array, cfg: KernelFFMConfig, plan: FFMBatchPlan) -> KernelFFMState:
    R, Dw = plan.n_rows_pad, cfg.row_width
    fk = cfg.n_fields * cfg.factor
    table = jnp.zeros((R, Dw))
    table = table.at[:, 1 : 1 + fk].set(
        jax.random.normal(rng, (R, fk)) * cfg.init_std
    )
    table = table.at[R - 1].set(0.0)  # padding rank row stays zero
    return KernelFFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        table=table,
        accum=jnp.zeros((R, Dw)),
    )


def _logits_from_rank_rows(table, w0, ranks, xv, cfg: KernelFFMConfig,
                           onehot_f, weighted):
    """Field-aggregation FFM forward over an [R, Dw] rank-space table
    (same math as ops/interactions.ffm_interaction, the tested ground
    truth). ranks: [n_pad] row-major position->rank; xv: [B, L]."""
    B, L = xv.shape
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    e = rank_lookup(table, ranks, cfg.interpret, cfg.exact)  # [n_pad, Dw]
    e = e[: B * L].reshape(B, L, Dw)
    w_pos = e[..., 0]                                       # [B, L]
    V = e[..., 1 : 1 + F * Kf].reshape(B, L, F, Kf)         # [B, L, F, K]
    wx = jnp.sum(w_pos * xv, axis=-1)
    # glue einsums ride the MXU; in fast mode stream them in bf16 with f32
    # accumulation (halves the [B,L,F,K] HBM traffic, the glue bottleneck)
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    Vc = V.astype(cdt)
    p = jnp.einsum("blf,blgk->bfgk", weighted.astype(cdt), Vc,
                   preferred_element_type=jnp.float32)      # [B, F1, F2, K]
    pc = p.astype(cdt)
    total = jnp.einsum("bfgk,bgfk->b", pc, pc,
                       preferred_element_type=jnp.float32)
    v_own = jnp.einsum("blf,blfk->blk", onehot_f.astype(cdt), Vc,
                       preferred_element_type=jnp.float32)  # [B, L, K]
    self_t = jnp.sum(jnp.sum(v_own * v_own, axis=-1) * xv * xv, axis=-1)
    return w0 + wx + 0.5 * (total - self_t)


def _logits_from_table(table, w0, plan: FFMBatchPlan, cfg: KernelFFMConfig,
                       onehot_f, weighted):
    return _logits_from_rank_rows(table, w0, plan.ranks, plan.xv, cfg,
                                  onehot_f, weighted)


def count_matrix(ranks, fields, xv, n_rows: int, n_fields: int, dtype):
    """C[(row, field), rank] = sum of x over the positions that land there
    — ONE scalar scatter-add of n updates. The position axis (n = B*L,
    the 2*n*R*Dw cost driver of the one-hot sweep) disappears before any
    Dw-wide math happens; every downstream contraction is over the R axis
    on [B*F, R], which the MXU eats as a single dense matmul.

    ranks: [n_pad] row-major (only the first B*L used); fields/xv: [B, L].
    Invalid positions carry xv=0, so they contribute nothing wherever
    their padding rank points."""
    B, L = xv.shape
    r = ranks[: B * L]
    bf = (jnp.arange(B, dtype=jnp.int32)[:, None] * n_fields
          + fields).reshape(-1)
    C = jnp.zeros((B * n_fields, n_rows), dtype)
    return C.at[bf, r].add(xv.reshape(-1).astype(dtype))


def _logits_from_counts(table, w0, C, ranks, fields, xv,
                        cfg: KernelFFMConfig):
    """Count-matrix FFM forward (cfg.agg): S = C @ table gives the
    field-aggregation tensor directly — S[(b,f), :] packs [sum of w over
    field f | sum of x*V[id] over field f]. Same math as
    _logits_from_rank_rows / ops.interactions.ffm_interaction (tested
    equal); the pairwise total is the standard aggregation identity with
    the per-position own-field self-term removed via a scalar gather of
    D2[rank, field] = ||V[rank, field]||^2."""
    B, L = xv.shape
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    S = jnp.einsum("pr,rd->pd", C, table.astype(cdt),
                   preferred_element_type=jnp.float32)    # [B*F, Dw]
    S = S.reshape(B, F, Dw)
    wx = jnp.sum(S[..., 0], axis=-1)                      # [B]
    P = S[..., 1 : 1 + F * Kf].reshape(B, F, F, Kf)       # [B, f, g, K]
    Pc = P.astype(cdt)
    total = jnp.einsum("bfgk,bgfk->b", Pc, Pc,
                       preferred_element_type=jnp.float32)
    V = table[:, 1 : 1 + F * Kf].reshape(-1, F, Kf)
    D2 = jnp.sum(V * V, axis=-1)                          # [R, F]
    d2own = D2[ranks[: B * L], fields.reshape(-1)].reshape(B, L)
    self_t = jnp.sum(xv * xv * d2own, axis=-1)
    return w0 + wx + 0.5 * (total - self_t)


def count_matrix_rows(ranks, xv2, n_rows: int, dtype):
    """Crow2[b, r] = sum of x^2 over row b's positions at rank r — the
    ROW-granular (not row×field) count matrix for the rank-field
    self-term. One scalar scatter-add; [B, R] is ~F× smaller than C."""
    B, L = xv2.shape
    r = ranks[: B * L]
    b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), L)
    C = jnp.zeros((B, n_rows), dtype)
    return C.at[b, r].add(xv2.reshape(-1).astype(dtype))


def _logits_from_counts_rf(table, w0, C, Crow2, rank_field,
                           cfg: KernelFFMConfig):
    """Count-matrix FFM forward with the RANK-FIELD self-term: when each
    feature id belongs to exactly one field (standard libffm data), the
    per-position self-term Σ x²·‖V[rank, field]‖² collapses to
    Crow2 @ d2r with d2r[r] = ‖V[r, rank_field[r]]‖² — a one-hot row
    select and a [B, R] matvec instead of a 384k-position gather +
    backward scatter (the old self-term was 6.46 ms of the 12.85 ms
    step, benchmarks/bench_ffm_ablate.py). d2r comes from an elementwise
    one-hot multiply, NOT V[arange, rank_field]: the gather's backward
    scatter costs 0.7 ms that the all-elementwise form doesn't
    (rf 7.99 vs onehot 7.30 ms, benchmarks/bench_ffm_self_variants.py;
    the matmul-fold variant measured 8.86 — rejected)."""
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    B = Crow2.shape[0]
    S = jnp.einsum("pr,rd->pd", C, table.astype(cdt),
                   preferred_element_type=jnp.float32)    # [B*F, Dw]
    S = S.reshape(B, F, Dw)
    wx = jnp.sum(S[..., 0], axis=-1)                      # [B]
    P = S[..., 1 : 1 + F * Kf].reshape(B, F, F, Kf)
    Pc = P.astype(cdt)
    total = jnp.einsum("bfgk,bgfk->b", Pc, Pc,
                       preferred_element_type=jnp.float32)
    V = table[:, 1 : 1 + F * Kf].reshape(-1, F, Kf)
    D2 = jnp.sum(V * V, axis=-1)                          # [R, F]
    onehot_rf = jax.nn.one_hot(rank_field, F, dtype=D2.dtype)
    d2r = jnp.sum(D2 * onehot_rf, axis=1)                 # [R]
    self_t = jnp.einsum("br,r->b", Crow2, d2r.astype(cdt),
                        preferred_element_type=jnp.float32)
    return w0 + wx + 0.5 * (total - self_t)


def make_train_step(cfg: KernelFFMConfig, plan: FFMBatchPlan):
    R = plan.n_rows_pad
    n_valid = plan.n_valid_rows
    # The big plan-constant count matrix C ([B*F, R], ~GB at full-batch
    # scale) must NOT be a jit closure constant: closed-over device arrays
    # are serialized into the HLO as literals, which blows the
    # remote-compile request-size limit (HTTP 413 over the tunnel). It
    # must also NOT be rebuilt in-graph every step: XLA does NOT hoist the
    # build out of the epoch scan (measured 23.2 ms in-graph vs 12.93 ms
    # as-argument — benchmarks/bench_ffm_agg_profile.py). So C is built
    # ONCE eagerly and threaded through the jit boundary as a runtime
    # argument; make_multi_step picks it up via the _stepfn/_consts
    # attributes and does the same inside its scan wrapper.
    if cfg.agg:
        cdt = jnp.float32 if cfg.exact else jnp.bfloat16
        C = count_matrix(plan.ranks, plan.fields, plan.xv, R,
                         cfg.n_fields, cdt)
        if plan.rank_field is not None:
            # rank-field self-term: 6.5 ms of per-position gather/scatter
            # becomes an R-gather + [B, R] matvec (bench_ffm_ablate.py)
            consts = (C, count_matrix_rows(plan.ranks, plan.xv * plan.xv,
                                           R, cdt))
            rf = jnp.asarray(plan.rank_field)

            def loss_fn(table, w0, consts):
                z = _logits_from_counts_rf(table, w0, consts[0], consts[1],
                                           rf, cfg)
                per = (jnp.maximum(z, 0) - z * plan.labels
                       + jnp.log1p(jnp.exp(-jnp.abs(z))))
                return jnp.sum(per * plan.row_mask) / n_valid
        else:
            consts = (C,)

            def loss_fn(table, w0, consts):
                z = _logits_from_counts(table, w0, consts[0], plan.ranks,
                                        plan.fields, plan.xv, cfg)
                per = (jnp.maximum(z, 0) - z * plan.labels
                       + jnp.log1p(jnp.exp(-jnp.abs(z))))
                return jnp.sum(per * plan.row_mask) / n_valid
    else:
        consts = None

        def loss_fn(table, w0, C):
            del C
            onehot_f = jax.nn.one_hot(plan.fields, cfg.n_fields)  # [B,L,F]
            weighted = onehot_f * plan.xv[..., None]
            z = _logits_from_table(table, w0, plan, cfg, onehot_f, weighted)
            per = (jnp.maximum(z, 0) - z * plan.labels
                   + jnp.log1p(jnp.exp(-jnp.abs(z))))
            return jnp.sum(per * plan.row_mask) / n_valid

    def raw_step(state: KernelFFMState, hyper, consts):
        # hyper: optional [lr, l2] runtime override (one compile across
        # hyperparameter sweeps — compiles are expensive over the tunnel)
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        loss, (g_table, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.table, state.w0, consts
        )
        g_table = g_table + l2 * state.table
        accum = state.accum + g_table * g_table
        table = state.table - lr * g_table / (jnp.sqrt(accum) + 1e-7)
        table = table.at[R - 1].set(0.0)    # keep the padding rank row zero
        w0_accum = state.w0_accum + g_w0 * g_w0
        w0 = state.w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return KernelFFMState(w0, w0_accum, table, accum), loss

    jitted = jax.jit(raw_step)

    def step(state: KernelFFMState, hyper=None):
        return jitted(state, hyper, consts)

    step._stepfn = raw_step
    step._consts = consts
    return step


@dataclasses.dataclass
class BlockedFFMPlan:
    """FIELD-BLOCKED rank layout for the count-matrix engine: rank =
    field * R_max + slot, where slot indexes the field's own sorted
    unique ids. Exploits the FFM structural fact that when feature ids
    partition into fields, C[(b, f), r] is nonzero ONLY where
    rank_field[r] == f — so the [B*F, R] x [R, Dw] product is block
    diagonal in (f, r) and collapses to the batched einsum
    'bfr,frd->bfd' over [B, F, R_max] x [F, R_max, Dw]: R/R_max fewer
    MACs (7.2x on the bundled data) and F x smaller count matrices.
    Built by plan_batch_blocked; None-able (fields must partition)."""

    fields: jax.Array      # [B, L] int32
    slots: jax.Array       # [B, L] int32, in-field slot (0 for invalid)
    xv: jax.Array          # [B, L] vals*mask
    labels: jax.Array      # [B]
    row_mask: jax.Array    # [B]
    uids_blk: np.ndarray   # [F, R_max] int64, uids_blk[f, i] (0-padded)
    cnts: np.ndarray       # [F] int64 unique ids per field
    n_fields: int
    r_max: int
    n_valid_rows: float


def plan_batch_blocked(ids, vals, mask, fields, labels, row_mask=None,
                       slot_pad: int = 128, r_max=None, n_fields=None):
    """-> BlockedFFMPlan, or None when the batch's feature ids do NOT
    partition into fields (an id observed under two different fields) —
    callers fall back to plan_batch + the flat agg engine then.
    n_fields: the MODEL's field count (cfg.n_fields); defaults to the
    batch maximum + 1."""
    B, L = ids.shape
    if row_mask is None:
        row_mask = np.ones((B,), np.float32)
    flat = ids.reshape(-1).astype(np.int64)
    flat_f = fields.reshape(-1).astype(np.int64)
    valid = mask.reshape(-1) > 0
    F = n_fields if n_fields is not None else (
        int(flat_f[valid].max()) + 1 if valid.any() else 1
    )
    # dedup on the (field, id) pair, then demand each id maps to one field
    key = flat[valid] * F + flat_f[valid]
    uniq_key = np.unique(key)
    u_ids = uniq_key // F
    u_fields = uniq_key % F
    if len(np.unique(u_ids)) != len(u_ids):
        return None                     # an id appears under two fields
    cnts = np.bincount(u_fields, minlength=F).astype(np.int64)
    if r_max is None:
        r_max = _round_up(int(cnts.max()) + 1, slot_pad)
    assert int(cnts.max()) < r_max, (int(cnts.max()), r_max)
    # slot of each unique (field, id): position within its field's run
    # (uniq_key is sorted by (id, field)? no — by key = id*F + field, so
    # runs are per-ID; recompute per-field order by sorting on field)
    order = np.argsort(u_fields, kind="stable")
    starts = np.zeros((F,), np.int64)
    starts[1:] = np.cumsum(cnts)[:-1]
    slot_of = np.empty((len(u_ids),), np.int64)
    slot_of[order] = np.arange(len(u_ids)) - np.repeat(starts, cnts)
    uids_blk = np.zeros((F, r_max), np.int64)
    uids_blk[u_fields, slot_of] = u_ids
    # per-position slots via searchsorted on the (field, id) key space
    pos_key = flat * F + flat_f
    k_idx = np.searchsorted(uniq_key, pos_key)
    k_idx = np.clip(k_idx, 0, len(uniq_key) - 1)
    slots = np.where(valid, slot_of[k_idx], 0).astype(np.int32)
    return BlockedFFMPlan(
        fields=jnp.asarray(fields.astype(np.int32)),
        slots=jnp.asarray(slots.reshape(B, L)),
        xv=jnp.asarray((vals * mask).astype(np.float32)),
        labels=jnp.asarray(labels.astype(np.float32)),
        row_mask=jnp.asarray(row_mask.astype(np.float32)),
        uids_blk=uids_blk,
        cnts=cnts,
        n_fields=F,
        r_max=r_max,
        n_valid_rows=float(row_mask.sum()),
    )


def count_matrix_blocked(plan: BlockedFFMPlan, weights, dtype):
    """[B, F, R_max] count matrix: one scalar scatter-add of B*L updates.
    Invalid positions carry weight 0 (slot 0), contributing nothing."""
    B, L = plan.xv.shape
    b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), L)
    C = jnp.zeros((B, plan.n_fields, plan.r_max), dtype)
    return C.at[b, plan.fields.reshape(-1), plan.slots.reshape(-1)].add(
        weights.reshape(-1).astype(dtype)
    )


def init_blocked(rng: jax.Array, cfg: KernelFFMConfig,
                 plan: BlockedFFMPlan) -> KernelFFMState:
    """Same noise law as init() on the [F*R_max, Dw] blocked table. Pad
    slots get noise too — their count-matrix columns are all-zero, so
    they never touch the logits or receive loss gradient (only inert L2
    decay), and export reads only the first cnts[f] slots per field."""
    R, Dw = plan.n_fields * plan.r_max, cfg.row_width
    fk = cfg.n_fields * cfg.factor
    table = jnp.zeros((R, Dw))
    table = table.at[:, 1 : 1 + fk].set(
        jax.random.normal(rng, (R, fk)) * cfg.init_std
    )
    return KernelFFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        table=table,
        accum=jnp.zeros((R, Dw)),
    )


def _logits_from_counts_blocked(table, w0, C_blk, Crow2_blk,
                                cfg: KernelFFMConfig, r_max: int):
    """Field-blocked count-matrix FFM forward: S[b, f] aggregates field
    f's positions against ONLY field f's table block (the only nonzero
    columns of the flat C). The self-term's own-field row-norms come from
    the diagonal (f == g) of the table's per-block V columns via an eye
    contraction (einsum keeps it unmaterialised)."""
    F, Kf, Dw = cfg.n_fields, cfg.factor, cfg.row_width
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    B = C_blk.shape[0]
    T = table.reshape(F, r_max, Dw)
    S = jnp.einsum("bfr,frd->bfd", C_blk, T.astype(cdt),
                   preferred_element_type=jnp.float32)    # [B, F, Dw]
    wx = jnp.sum(S[..., 0], axis=-1)                      # [B]
    P = S[..., 1 : 1 + F * Kf].reshape(B, F, F, Kf)
    Pc = P.astype(cdt)
    total = jnp.einsum("bfgk,bgfk->b", Pc, Pc,
                       preferred_element_type=jnp.float32)
    # own-field V slice via a column-selection einsum: sel[f, k, d] picks
    # column 1 + f*Kf + k of field f's block. Beats the equivalent eye
    # contraction over V4 [F, R_max, F, Kf]: that einsum's backward
    # materialises the full 95 MB d_V4 intermediate, this one's writes
    # dT [F, R_max, Dw] directly (measured 2.08 ms -> see PARITY.md).
    d_cols = 1 + jnp.arange(F)[:, None, None] * Kf \
        + jnp.arange(Kf)[None, :, None]                   # [F, Kf, 1]
    sel = (jnp.arange(Dw)[None, None, :] == d_cols).astype(T.dtype)
    v_own = jnp.einsum("frd,fkd->frk", T, sel)            # [F, R_max, Kf]
    d2r = jnp.sum(v_own * v_own, axis=-1)                 # [F, R_max]
    self_t = jnp.einsum("bfi,fi->b", Crow2_blk, d2r.astype(cdt),
                        preferred_element_type=jnp.float32)
    return w0 + wx + 0.5 * (total - self_t)


def make_train_step_blocked(cfg: KernelFFMConfig, plan: BlockedFFMPlan):
    """Full-batch FFM train step on the field-blocked layout — the same
    Adagrad trainer as make_train_step with the block-diagonal einsum
    forward. Carries _stepfn/_consts for make_multi_step (the count
    matrices stay runtime arguments, never HLO literals)."""
    n_valid = plan.n_valid_rows
    r_max = plan.r_max
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    consts = (
        count_matrix_blocked(plan, plan.xv, cdt),
        count_matrix_blocked(plan, plan.xv * plan.xv, cdt),
    )

    def loss_fn(table, w0, consts):
        z = _logits_from_counts_blocked(table, w0, consts[0], consts[1],
                                        cfg, r_max)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    def raw_step(state: KernelFFMState, hyper, consts):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        loss, (g_table, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.table, state.w0, consts
        )
        g_table = g_table + l2 * state.table
        accum = state.accum + g_table * g_table
        table = state.table - lr * g_table / (jnp.sqrt(accum) + 1e-7)
        w0_accum = state.w0_accum + g_w0 * g_w0
        w0 = state.w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return KernelFFMState(w0, w0_accum, table, accum), loss

    jitted = jax.jit(raw_step)

    def step(state: KernelFFMState, hyper=None):
        return jitted(state, hyper, consts)

    step._stepfn = raw_step
    step._consts = consts
    return step


def export_params_blocked(state: KernelFFMState, plan: BlockedFFMPlan,
                          cfg: KernelFFMConfig) -> dict:
    """-> params dict usable with models/ffm.forward (full-vocab space)."""
    F, Kf = cfg.n_fields, cfg.factor
    w_full = np.zeros((cfg.n_features,), np.float32)
    v_full = np.zeros((cfg.n_features, F, Kf), np.float32)
    table = np.asarray(state.table).reshape(plan.n_fields, plan.r_max, -1)
    for f in range(plan.n_fields):
        n = int(plan.cnts[f])
        if n == 0:
            continue
        uids = plan.uids_blk[f, :n]
        w_full[uids] = table[f, :n, 0]
        v_full[uids] = table[f, :n, 1 : 1 + F * Kf].reshape(-1, F, Kf)
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(w_full),
        "v": jnp.asarray(v_full),
    }


@dataclasses.dataclass
class GroupedFFMPlan:
    """GROUPED field-blocked layout: the blocked layout pads EVERY field
    to the largest field's unique count (r_max), so skewed data (the
    bundled CTR set: 8 fields with 545-1265 uniques, 31 empty fields,
    rest tiny) wastes most of the table. Here active fields are permuted
    by descending unique count and DP-partitioned into <= max_groups
    contiguous segments, each padded only to ITS largest member — 6.9x
    fewer table rows on the bundled data (87,040 -> 12,544), cutting the
    main einsum MACs, count-matrix HBM traffic and optimizer work by the
    same factor. Empty fields get no rows at all (their S block is a
    zeros concat). Built by plan_batch_grouped; None when ids don't
    partition into fields."""

    new_field: jax.Array        # [B, L] int32 PERMUTED field index
    slots: jax.Array            # [B, L] int32 in-field slot (0 invalid)
    xv: jax.Array               # [B, L] vals*mask
    labels: jax.Array           # [B]
    row_mask: jax.Array         # [B]
    perm: np.ndarray            # [F] old field -> new (permuted) index
    inv_perm: np.ndarray        # [F] new -> old
    f_start: tuple              # per group: first new-field index
    f_end: tuple                # per group: one-past-last new-field index
    r_g: tuple                  # per group: slot capacity (>= max cnt)
    row_offset: tuple           # per group: offset into the flat table
    n_rows_total: int           # sum_g (f_end-f_start) * r_g
    uids_grp: list              # per group: [F_g, r_g] int64 (0-padded)
    cnts: np.ndarray            # [F] uniques per OLD field
    n_fields: int               # F (model field count)
    n_active: int               # new fields [0, n_active) have cnt > 0
    n_valid_rows: float


def _octave_up(x: int, base: int) -> int:
    """Round x up to base * 2^k."""
    v = base
    while v < x:
        v *= 2
    return v


def _group_partition(csort: np.ndarray, max_groups: int, pad: int,
                     octave: bool = False):
    """DP: partition the DESC-sorted active counts into <= max_groups
    contiguous segments minimising total rows sum(len_g * r_g), where
    r_g = round_up(first element, pad) (the segment max). Returns
    (boundaries, r_g): boundaries[k]..boundaries[k+1] is segment k.

    octave=True rounds each count to pad * 2^k BEFORE the DP, so group
    boundaries land where the count OCTAVE changes and the whole layout
    stays put under traffic jitter. NOTE: the production grouped scorer
    ended up on a stronger mechanism — a FROZEN calibrated layout with
    slack hysteresis (layout_from_batch / plan_into_layout) — so this
    mode is a tested library option, not a product dependency."""
    A = len(csort)
    if octave:
        r_of = [_octave_up(max(int(c), 1), pad) for c in csort]
    else:
        r_of = [_round_up(max(int(c), 1), pad) for c in csort]
    INF = float("inf")
    # dp[g][i]: min rows covering first i fields with g segments
    dp = [[INF] * (A + 1) for _ in range(max_groups + 1)]
    back = [[0] * (A + 1) for _ in range(max_groups + 1)]
    dp[0][0] = 0
    for g in range(1, max_groups + 1):
        for i in range(1, A + 1):
            for j in range(i):           # segment [j, i), max at csort[j]
                cost = dp[g - 1][j] + (i - j) * r_of[j]
                if cost < dp[g][i]:
                    dp[g][i] = cost
                    back[g][i] = j
    g_best = min(range(1, max_groups + 1), key=lambda g: dp[g][A])
    bounds = [A]
    i, g = A, g_best
    while i > 0:
        j = back[g][i]
        bounds.append(j)
        i, g = j, g - 1
    bounds = bounds[::-1]
    return bounds, [r_of[j] for j in bounds[:-1]]


def _field_id_dedup(flat, flat_f, valid, F: int):
    """Dedup the batch's (field, id) pairs. None if an id appears under
    two fields (ids must partition into fields for blocked layouts),
    else (uniq_key, u_ids, u_fields, cnts [F], slot_of [U], slots [n])
    where slot_of[u] is unique u's slot within its field's sorted run
    and slots is the per-position slot (0 for invalid positions)."""
    key = flat[valid] * F + flat_f[valid]
    uniq_key = np.unique(key)
    if len(uniq_key) == 0:
        return None
    u_ids = uniq_key // F
    u_fields = uniq_key % F
    if len(np.unique(u_ids)) != len(u_ids):
        return None                     # an id appears under two fields
    cnts = np.bincount(u_fields, minlength=F).astype(np.int64)
    forder = np.argsort(u_fields, kind="stable")
    starts = np.zeros((F,), np.int64)
    starts[1:] = np.cumsum(cnts)[:-1]
    slot_of = np.empty((len(u_ids),), np.int64)
    slot_of[forder] = np.arange(len(u_ids)) - np.repeat(starts, cnts)
    pos_key = flat * F + flat_f
    k_idx = np.searchsorted(uniq_key, pos_key)
    k_idx = np.clip(k_idx, 0, len(uniq_key) - 1)
    slots = np.where(valid, slot_of[k_idx], 0).astype(np.int32)
    return uniq_key, u_ids, u_fields, cnts, slot_of, slots


def plan_batch_grouped(ids, vals, mask, fields, labels, row_mask=None,
                       slot_pad: int = 128, max_groups: int = 4,
                       n_fields=None, octave: bool = False):
    """-> GroupedFFMPlan, or None when ids don't partition into fields.
    slot_pad=128: XLA pads the count matrices' minor (slot) dim to the
    128-lane tile anyway, so capacities below 128 buy nothing.
    octave=True: capacities and group boundaries quantise to slot_pad*2^k
    (compile-key stability for the serving path — see _group_partition)."""
    B, L = ids.shape
    if row_mask is None:
        row_mask = np.ones((B,), np.float32)
    flat = ids.reshape(-1).astype(np.int64)
    flat_f = fields.reshape(-1).astype(np.int64)
    valid = mask.reshape(-1) > 0
    F = n_fields if n_fields is not None else (
        int(flat_f[valid].max()) + 1 if valid.any() else 1
    )
    dd = _field_id_dedup(flat, flat_f, valid, F)
    if dd is None:
        return None
    uniq_key, u_ids, u_fields, cnts, slot_of, slots = dd
    # permute fields by descending unique count (stable: ties keep order)
    order = np.argsort(-cnts, kind="stable")     # order[new] = old
    perm = np.empty((F,), np.int64)
    perm[order] = np.arange(F)                   # perm[old] = new
    n_active = int((cnts > 0).sum())
    csort = cnts[order][:n_active]
    bounds, r_gs = _group_partition(csort, max_groups, slot_pad, octave)
    f_start = tuple(int(b) for b in bounds[:-1])
    f_end = tuple(int(b) for b in bounds[1:])
    r_g = tuple(int(r) for r in r_gs)
    row_offset, off = [], 0
    for s, e, r in zip(f_start, f_end, r_g):
        row_offset.append(off)
        off += (e - s) * r
    uids_grp = []
    for s, e, r in zip(f_start, f_end, r_g):
        u = np.zeros((e - s, r), np.int64)
        sel = (perm[u_fields] >= s) & (perm[u_fields] < e)
        u[perm[u_fields[sel]] - s, slot_of[sel]] = u_ids[sel]
        uids_grp.append(u)
    return GroupedFFMPlan(
        # clip before the perm map: masked-out positions carry arbitrary
        # field values (weight 0 — the value never matters downstream)
        new_field=jnp.asarray(perm[np.clip(fields.astype(np.int64), 0,
                                           F - 1)].astype(np.int32)),
        slots=jnp.asarray(slots.reshape(B, L)),
        xv=jnp.asarray((vals * mask).astype(np.float32)),
        labels=jnp.asarray(labels.astype(np.float32)),
        row_mask=jnp.asarray(row_mask.astype(np.float32)),
        perm=perm,
        inv_perm=order,
        f_start=f_start,
        f_end=f_end,
        r_g=r_g,
        row_offset=tuple(row_offset),
        n_rows_total=off,
        uids_grp=uids_grp,
        cnts=cnts,
        n_fields=F,
        n_active=n_active,
        n_valid_rows=float(row_mask.sum()),
    )


class GroupedLayout(NamedTuple):
    """A FROZEN grouped table layout for serving: field permutation +
    group spans + per-group slot capacities, calibrated once from an
    observed batch (layout_from_batch) and reused across batches
    (plan_into_layout) until traffic overflows it. This is the
    plan-ahead/re-plan-on-overflow contract the range-partitioned FM
    master uses (fm_kernel.partition_caps_for), applied to the grouped
    FFM serving path: steady traffic costs ONE compiled program, and a
    capacity breach is a loud re-calibration signal, never silent
    corruption."""

    perm: np.ndarray       # [F] old field -> new (permuted) index
    inv_perm: np.ndarray   # [F] new -> old
    f_start: tuple         # per group: first new-field index
    f_end: tuple           # per group: one-past-last new-field index
    r_g: tuple             # per group: slot capacity
    row_offset: tuple      # per group: offset into the flat table
    n_rows_total: int
    n_active: int
    n_fields: int
    caps_field: np.ndarray  # [F] slot capacity of each OLD field (0 = inactive)


def layout_from_batch(ids, mask, fields, n_fields: int,
                      slot_pad: int = 128, max_groups: int = 4,
                      slack: float = 1.2):
    """Calibrate a GroupedLayout from one observed batch: per-field
    unique counts * slack (headroom for traffic jitter, so steady
    traffic does not re-calibrate), DP-grouped like plan_batch_grouped.
    None when ids don't partition into fields."""
    F = n_fields
    flat = ids.reshape(-1).astype(np.int64)
    flat_f = fields.reshape(-1).astype(np.int64)
    valid = mask.reshape(-1) > 0
    dd = _field_id_dedup(flat, flat_f, valid, F)
    if dd is None:
        return None
    _, _, _, cnts, _, _ = dd
    slacked = np.ceil(cnts * slack).astype(np.int64)
    order = np.argsort(-cnts, kind="stable")
    perm = np.empty((F,), np.int64)
    perm[order] = np.arange(F)
    n_active = int((cnts > 0).sum())
    csort = slacked[order][:n_active]
    bounds, r_gs = _group_partition(csort, max_groups, slot_pad)
    f_start = tuple(int(b) for b in bounds[:-1])
    f_end = tuple(int(b) for b in bounds[1:])
    r_g = tuple(int(r) for r in r_gs)
    row_offset, off = [], 0
    for s, e, r in zip(f_start, f_end, r_g):
        row_offset.append(off)
        off += (e - s) * r
    caps_field = np.zeros((F,), np.int64)
    for s, e, r in zip(f_start, f_end, r_g):
        caps_field[order[s:e]] = r
    return GroupedLayout(
        perm=perm, inv_perm=order, f_start=f_start, f_end=f_end,
        r_g=r_g, row_offset=tuple(row_offset), n_rows_total=off,
        n_active=n_active, n_fields=F, caps_field=caps_field)


def plan_into_layout(layout: GroupedLayout, ids, mask, fields):
    """Plan a batch INTO a frozen GroupedLayout. Returns
    (new_field [B, L] int32, slots [B, L] int32, uids_flat
    [n_rows_total] int64, ok) — ok False when the batch does not fit
    the layout (a field's unique count exceeds its slot capacity, a
    previously-inactive field appears, or ids stop partitioning into
    fields); the caller then re-calibrates via layout_from_batch.
    Pad slots carry uid 0 — harmless downstream: their count-matrix
    and Crow2 columns are identically zero (see init_grouped)."""
    B, L = ids.shape
    F = layout.n_fields
    flat = ids.reshape(-1).astype(np.int64)
    flat_f = fields.reshape(-1).astype(np.int64)
    valid = mask.reshape(-1) > 0
    dd = _field_id_dedup(flat, flat_f, valid, F)
    if dd is None:
        return None, None, None, False
    _, u_ids, u_fields, cnts, slot_of, slots = dd
    if np.any(cnts > layout.caps_field):
        return None, None, None, False
    uids_flat = np.zeros((layout.n_rows_total,), np.int64)
    nf_of_u = layout.perm[u_fields]
    for s, e, r, off in zip(layout.f_start, layout.f_end, layout.r_g,
                            layout.row_offset):
        sel = (nf_of_u >= s) & (nf_of_u < e)
        uids_flat[off + (nf_of_u[sel] - s) * r + slot_of[sel]] = u_ids[sel]
    new_field = layout.perm[np.clip(flat_f, 0, F - 1)].astype(np.int32)
    return (new_field.reshape(B, L), slots.reshape(B, L).astype(np.int32),
            uids_flat, True)


def count_matrices_grouped_arrays(new_field, slots, weights,
                                  f_start, f_end, r_g, dtype):
    """Per-group [B, F_g, r_g] count matrices from raw [B, L] arrays: one
    scalar scatter-add per group, out-of-group positions carry weight 0
    (and clipped indices). The plan-free form the forward-only scorer
    shares with the trainer (serve/scorer.make_ffm_grouped_scorer)."""
    B, L = weights.shape
    b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), L)
    nf = new_field.reshape(-1)
    sl = slots.reshape(-1)
    w = weights.reshape(-1).astype(dtype)
    out = []
    for s, e, r in zip(f_start, f_end, r_g):
        in_g = (nf >= s) & (nf < e) & (sl < r)
        f_loc = jnp.clip(nf - s, 0, e - s - 1)
        s_loc = jnp.clip(sl, 0, r - 1)
        C = jnp.zeros((B, e - s, r), dtype)
        out.append(C.at[b, f_loc, s_loc].add(
            jnp.where(in_g, w, jnp.zeros((), dtype))))
    return tuple(out)


def count_matrices_grouped(plan: GroupedFFMPlan, weights, dtype):
    """Per-group [B, F_g, r_g] count matrices for a GroupedFFMPlan."""
    return count_matrices_grouped_arrays(
        plan.new_field, plan.slots, weights,
        plan.f_start, plan.f_end, plan.r_g, dtype)


def grouped_row_width(cfg: KernelFFMConfig, plan: GroupedFFMPlan) -> int:
    """ACTIVE row width: [w | V(n_active*factor)]. In permuted space the
    active fields are contiguous at 0..n_active-1, so V column blocks
    for fields never observed in the plan (31 of 68 on the bundled data)
    are dropped from the table entirely — they receive no gradient in
    any engine (their partner S rows are identically zero), and the
    pairwise einsum shrinks from F^2 to n_active^2 field pairs."""
    return 1 + plan.n_active * cfg.factor


def init_grouped(rng: jax.Array, cfg: KernelFFMConfig,
                 plan: GroupedFFMPlan) -> KernelFFMState:
    """Same noise law as init() on the [n_rows_total, Dwa] ACTIVE-width
    flat table (pad slots get inert noise, like init_blocked)."""
    R, Dwa = plan.n_rows_total, grouped_row_width(cfg, plan)
    fk = plan.n_active * cfg.factor
    table = jnp.zeros((R, Dwa))
    table = table.at[:, 1 : 1 + fk].set(
        jax.random.normal(rng, (R, fk)) * cfg.init_std
    )
    return KernelFFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        table=table,
        accum=jnp.zeros((R, Dwa)),
    )


def _logits_from_counts_grouped_core(table, w0, Cs, Crow2s, A: int,
                                     Kf: int, cdt, f_start, f_end, r_g,
                                     row_offset):
    """Grouped block-diagonal forward on raw layout tuples: one
    'bfr,frd->bfd' einsum per group, field blocks concatenated into the
    [B, A, Dwa] aggregate S the pairwise/self terms consume (A =
    n_active; empty fields carry no rows, no columns, and no pairwise
    work — their aggregates are identically zero). All field indices
    here are PERMUTED (descending-count)."""
    Dwa = 1 + A * Kf
    S_parts, self_t = [], 0.0
    for gi, (s, e, r, off) in enumerate(zip(f_start, f_end,
                                            r_g, row_offset)):
        Fg = e - s
        Tg = table[off : off + Fg * r].reshape(Fg, r, Dwa)
        S_parts.append(jnp.einsum("bfr,frd->bfd", Cs[gi], Tg.astype(cdt),
                                  preferred_element_type=jnp.float32))
        # own-field V columns of this group's rows (global new-field
        # index s+f selects the column block) — column-selection einsum,
        # backward writes dTg directly (see _logits_from_counts_blocked)
        d_cols = (1 + (s + jnp.arange(Fg))[:, None, None] * Kf
                  + jnp.arange(Kf)[None, :, None])        # [Fg, Kf, 1]
        sel = (jnp.arange(Dwa)[None, None, :] == d_cols).astype(Tg.dtype)
        v_own = jnp.einsum("frd,fkd->frk", Tg, sel)       # [Fg, r, Kf]
        d2r = jnp.sum(v_own * v_own, axis=-1)             # [Fg, r]
        self_t = self_t + jnp.einsum("bfi,fi->b", Crow2s[gi],
                                     d2r.astype(cdt),
                                     preferred_element_type=jnp.float32)
    S = jnp.concatenate(S_parts, axis=1)                  # [B, A, Dwa]
    wx = jnp.sum(S[..., 0], axis=-1)
    B = S.shape[0]
    P = S[..., 1 : 1 + A * Kf].reshape(B, A, A, Kf).astype(cdt)
    total = jnp.einsum("bfgk,bgfk->b", P, P,
                       preferred_element_type=jnp.float32)
    return w0 + wx + 0.5 * (total - self_t)


def _logits_from_counts_grouped(table, w0, Cs, Crow2s, cfg: KernelFFMConfig,
                                plan: GroupedFFMPlan):
    """Grouped forward on a GroupedFFMPlan (the table is learned in
    permuted space; export_params_grouped de-permutes)."""
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    return _logits_from_counts_grouped_core(
        table, w0, Cs, Crow2s, plan.n_active, cfg.factor, cdt,
        plan.f_start, plan.f_end, plan.r_g, plan.row_offset)


def make_train_step_grouped(cfg: KernelFFMConfig, plan: GroupedFFMPlan):
    """Full-batch FFM train step on the grouped layout — same Adagrad
    trainer as make_train_step_blocked. Carries _stepfn/_consts for
    make_multi_step (count matrices stay runtime args, never literals)."""
    n_valid = plan.n_valid_rows
    cdt = jnp.float32 if cfg.exact else jnp.bfloat16
    consts = (
        count_matrices_grouped(plan, plan.xv, cdt),
        count_matrices_grouped(plan, plan.xv * plan.xv, cdt),
    )

    def loss_fn(table, w0, consts):
        z = _logits_from_counts_grouped(table, w0, consts[0], consts[1],
                                        cfg, plan)
        per = (jnp.maximum(z, 0) - z * plan.labels
               + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return jnp.sum(per * plan.row_mask) / n_valid

    def raw_step(state: KernelFFMState, hyper, consts):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]
        loss, (g_table, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.table, state.w0, consts
        )
        g_table = g_table + l2 * state.table
        accum = state.accum + g_table * g_table
        table = state.table - lr * g_table / (jnp.sqrt(accum) + 1e-7)
        w0_accum = state.w0_accum + g_w0 * g_w0
        w0 = state.w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return KernelFFMState(w0, w0_accum, table, accum), loss

    jitted = jax.jit(raw_step)

    def step(state: KernelFFMState, hyper=None):
        return jitted(state, hyper, consts)

    step._stepfn = raw_step
    step._consts = consts
    return step


def export_params_grouped(state: KernelFFMState, plan: GroupedFFMPlan,
                          cfg: KernelFFMConfig) -> dict:
    """-> params dict usable with models/ffm.forward (full-vocab space).
    The table's V column blocks are indexed by PERMUTED field — the
    middle axis is de-permuted with plan.inv_perm. Partner-field blocks
    for fields unobserved in the plan don't exist in the active-width
    table and export as zeros (they receive no gradient in any engine;
    the dense engines leave them at init noise — both untrained)."""
    F, Kf = cfg.n_fields, cfg.factor
    A = plan.n_active
    Dwa = grouped_row_width(cfg, plan)
    w_full = np.zeros((cfg.n_features,), np.float32)
    v_full = np.zeros((cfg.n_features, F, Kf), np.float32)
    table = np.asarray(state.table)
    csort = plan.cnts[plan.inv_perm]
    active_old = plan.inv_perm[:A]       # old-field index of each block
    for gi, (s, e, r, off) in enumerate(zip(plan.f_start, plan.f_end,
                                            plan.r_g, plan.row_offset)):
        Tg = table[off : off + (e - s) * r].reshape(e - s, r, Dwa)
        for fl in range(e - s):
            n = int(csort[s + fl])
            if n == 0:
                continue
            uids = plan.uids_grp[gi][fl, :n]
            w_full[uids] = Tg[fl, :n, 0]
            v_new = Tg[fl, :n, 1 : 1 + A * Kf].reshape(-1, A, Kf)
            v_full[uids[:, None], active_old[None, :]] = v_new
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(w_full),
        "v": jnp.asarray(v_full),
    }


class StreamingFFMState(NamedTuple):
    """Master tables in VOCAB space [V, Dw] — the PS-scale FFM deployment
    (the reference's FFM under paramserver.h needs its cluster to hold
    V * (1 + F*K) floats; here one chip streams against the HBM-resident
    master, and parallel/sharded_kernel shards it over `model`)."""

    w0: jax.Array
    w0_accum: jax.Array
    table: jax.Array   # [V, Dw] packed [w | V(F*K) | pad]
    accum: jax.Array   # [V, Dw] adagrad accumulator


def streaming_init(rng: jax.Array, cfg: KernelFFMConfig) -> StreamingFFMState:
    V, Dw = cfg.n_features, cfg.row_width
    fk = cfg.n_fields * cfg.factor
    table = jnp.zeros((V, Dw))
    table = table.at[:, 1 : 1 + fk].set(
        jax.random.normal(rng, (V, fk)) * cfg.init_std
    )
    return StreamingFFMState(
        w0=jnp.zeros(()),
        w0_accum=jnp.zeros(()),
        table=table,
        accum=jnp.zeros((V, Dw)),
    )


def plan_to_arrays(plan: FFMBatchPlan, capacity: int) -> dict:
    """Per-batch runtime arrays for make_streaming_train_step. Build the
    plan with n_rows_pad=capacity so shapes stay stable across batches."""
    assert plan.n_rows_pad == capacity, (
        f"plan built with R={plan.n_rows_pad}, step expects {capacity}"
    )
    return {
        "uids": jnp.asarray(plan.uids[:capacity].astype(np.int32)),
        "n_unique": jnp.int32(plan.n_unique),
        "ranks": plan.ranks,
        "xv": plan.xv,
        "fields": plan.fields,
        "labels": plan.labels,
        "row_mask": plan.row_mask,
    }


@functools.partial(jax.jit, static_argnames=("capacity",))
def plan_batch_on_device(ids, vals, mask, fields, labels, row_mask,
                         capacity: int) -> dict:
    """DEVICE-side batch planning for the streaming FFM step: dedup the
    batch's feature ids into rank space entirely under ONE jit (eager ops
    each dispatch separately over the tunneled backend). Same rank
    assignment as the host plan_batch (ranks in sorted-id order, natural
    [B*L] position order, padding rank = capacity-1) — mirrors the
    reference worker's per-batch pull-key set
    (distributed_algo_abst.h:181-190) without the host round-trip.

    ids/vals/mask/fields: [B, L] device arrays; labels/row_mask: [B].
    capacity: static rank-space size, > max uniques per batch
    (e.g. B*L + 1 rounded up; see train/kernel_engine._streaming_dims).
    Returns the dict make_streaming_train_step consumes.

    Feature ids must be < 2**31 - 1: ids are cast to int32 and INT32_MAX
    is the invalid-position sentinel (the host plan_batch works in
    int64). The step factories guard this at build time.
    """
    B, L = ids.shape
    n = B * L
    n_pad = _round_up(n, TILE)
    flat = ids.reshape(-1).astype(jnp.int32)
    valid = mask.reshape(-1) > 0
    sentinel = jnp.int32(2**31 - 1)
    keyed = jnp.where(valid, flat, sentinel)
    if n_pad > n:
        keyed = jnp.concatenate(
            [keyed, jnp.full((n_pad - n,), sentinel, jnp.int32)]
        )
    order = jnp.argsort(keyed)
    sorted_ids = keyed[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)]
    )
    is_new = jnp.where(sorted_ids == sentinel, 0, is_new)
    ranks = jnp.cumsum(is_new) - 1
    n_unique = jnp.sum(is_new)

    pad_rank = capacity - 1
    ranks_sorted = jnp.where(sorted_ids == sentinel, pad_rank,
                             ranks).astype(jnp.int32)
    # back to natural position order: order is a permutation of [0, n_pad)
    ranks_nat = (jnp.zeros((n_pad,), jnp.int32)
                 .at[order].set(ranks_sorted))
    # uids[rank] = id, first-occurrence scatter; others dropped
    take = jnp.where(is_new > 0, ranks, capacity)
    uids = (
        jnp.zeros((capacity + 1,), jnp.int32)
        .at[take].set(jnp.where(sorted_ids == sentinel, 0, sorted_ids),
                      mode="drop")[:capacity]
    )
    return {
        "uids": uids,
        "n_unique": n_unique.astype(jnp.int32),
        "ranks": ranks_nat,
        "xv": (vals * mask).astype(jnp.float32),
        "fields": fields.astype(jnp.int32),
        "labels": labels.astype(jnp.float32),
        "row_mask": row_mask.astype(jnp.float32),
    }


def make_streaming_train_step_fused(cfg: KernelFFMConfig, capacity: int,
                                    fields_partition: bool = False):
    """ONE-dispatch streaming FFM step on raw [B, L] batches: the device
    batch planner is traced INTO the streaming step, so each deployment
    minibatch costs a single program dispatch (transfer + plan + step) —
    the same collapse that took the FM twin from 7.5 to 4.19 ms at B=256
    over the tunneled backend (PARITY.md). Numerics identical to
    plan_batch + plan_to_arrays + make_streaming_train_step
    (tests/test_ffm_streaming.py)."""
    assert cfg.n_features < 2**31 - 1, (
        f"device planner is int32 with INT32_MAX as the pad sentinel; "
        f"n_features={cfg.n_features} would silently wrap/collide "
        f"(use host plan_batch, which is int64, beyond 2**31-2)")
    inner = make_streaming_train_step(cfg, capacity, fields_partition)
    # trace through the jitted wrappers (their donation marks don't apply
    # inside an outer jit); donation lives on THIS boundary instead
    inner_raw = inner.__wrapped__
    plan_raw = plan_batch_on_device.__wrapped__

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFFMState, ids, vals, mask, fields, labels,
             row_mask, hyper=None):
        b = plan_raw(ids, vals, mask, fields, labels, row_mask,
                     capacity=capacity)
        return inner_raw(state, b, hyper)

    return step


def make_streaming_train_step(cfg: KernelFFMConfig, capacity: int,
                              fields_partition: bool = False):
    """Minibatch-streaming kernel FFM: one compiled program serves every
    batch. pull (gather unique vocab rows into rank space) -> the same
    field-aggregation forward/backward as make_train_step -> row-sparse
    Adagrad push (server-side-update analogue, state co-located).

    fields_partition=True (caller-asserted dataset property: every feature
    id belongs to exactly one field, i.e. plan_batch yields rank_field on
    every batch) switches the agg engine to the rank-field self-term
    (_logits_from_counts_rf) with the rank->field map built in-graph —
    same 12.9 -> 8.2 ms win as the full-batch step (PARITY.md).

    Loss trajectories equal make_train_step's on the touched rows
    (tests/test_ffm_streaming.py); untouched rows differ only in that the
    full-batch step L2-decays every resident rank row each step while the
    streaming step, like the reference's PS, only updates pulled rows."""
    R = capacity

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StreamingFFMState, b: dict, hyper=None):
        lr = cfg.learning_rate if hyper is None else hyper[0]
        l2 = cfg.l2 if hyper is None else hyper[1]

        uids = b["uids"]
        n_unique = b["n_unique"]
        rows = state.table[uids]                 # "pull" [R, Dw]
        rows = rows.at[R - 1].set(0.0)           # padding rank reads zero

        n_valid = jnp.maximum(jnp.sum(b["row_mask"]), 1.0)
        if cfg.agg:
            cdt = jnp.float32 if cfg.exact else jnp.bfloat16
            C = count_matrix(b["ranks"], b["fields"], b["xv"], R,
                             cfg.n_fields, cdt)
            if fields_partition:
                # rank->field map built in-graph: valid positions agree by
                # the caller-asserted dataset property; invalid positions
                # only touch the zeroed padding rank row, and unused rank
                # slots have all-zero Crow2 columns, so neither leaks into
                # the logits or the gradient.
                Bb, Lb = b["xv"].shape
                rf = (jnp.zeros((R,), jnp.int32)
                      .at[b["ranks"][: Bb * Lb]]
                      .set(b["fields"].reshape(-1)))
                Crow2 = count_matrix_rows(b["ranks"], b["xv"] * b["xv"],
                                          R, cdt)

                def loss_fn(rows, w0):
                    z = _logits_from_counts_rf(rows, w0, C, Crow2, rf, cfg)
                    per = (jnp.maximum(z, 0) - z * b["labels"]
                           + jnp.log1p(jnp.exp(-jnp.abs(z))))
                    return jnp.sum(per * b["row_mask"]) / n_valid
            else:
                def loss_fn(rows, w0):
                    z = _logits_from_counts(rows, w0, C, b["ranks"],
                                            b["fields"], b["xv"], cfg)
                    per = (jnp.maximum(z, 0) - z * b["labels"]
                           + jnp.log1p(jnp.exp(-jnp.abs(z))))
                    return jnp.sum(per * b["row_mask"]) / n_valid
        else:
            onehot_f = jax.nn.one_hot(b["fields"], cfg.n_fields)
            weighted = onehot_f * b["xv"][..., None]

            def loss_fn(rows, w0):
                z = _logits_from_rank_rows(rows, w0, b["ranks"], b["xv"],
                                           cfg, onehot_f, weighted)
                per = (jnp.maximum(z, 0) - z * b["labels"]
                       + jnp.log1p(jnp.exp(-jnp.abs(z))))
                return jnp.sum(per * b["row_mask"]) / n_valid

        loss, (g_rows, g_w0) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, state.w0
        )
        g_rows = g_rows + l2 * rows

        # row-sparse adagrad push: padding ranks redirected out of bounds
        pos = jnp.arange(R)
        m = (pos < n_unique).astype(jnp.float32)[:, None]
        g = g_rows * m
        acc_rows = state.accum[uids] + g * g
        upd = lr * g / (jnp.sqrt(acc_rows) + 1e-7)
        safe_uids = jnp.where(pos < n_unique, uids, state.table.shape[0])
        accum = state.accum.at[safe_uids].set(acc_rows, mode="drop")
        table = state.table.at[safe_uids].add(-upd, mode="drop")

        w0_accum = state.w0_accum + g_w0 * g_w0
        w0 = state.w0 - lr * g_w0 / (jnp.sqrt(w0_accum) + 1e-7)
        return StreamingFFMState(w0, w0_accum, table, accum), loss

    return step


def export_streaming_params(state: StreamingFFMState,
                            cfg: KernelFFMConfig) -> dict:
    """-> params dict usable with models/ffm.forward (vocab space)."""
    F, Kf = cfg.n_fields, cfg.factor
    table = np.asarray(state.table)
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(table[:, 0]),
        "v": jnp.asarray(table[:, 1 : 1 + F * Kf].reshape(-1, F, Kf)),
    }


def predict_logits(state: KernelFFMState, plan: FFMBatchPlan,
                   cfg: KernelFFMConfig) -> jax.Array:
    onehot_f = jax.nn.one_hot(plan.fields, cfg.n_fields)
    weighted = onehot_f * plan.xv[..., None]
    return _logits_from_table(state.table, state.w0, plan, cfg,
                              onehot_f, weighted)


def export_params(state: KernelFFMState, plan: FFMBatchPlan,
                  cfg: KernelFFMConfig) -> dict:
    """-> params dict usable with models/ffm.forward (full-vocab space)."""
    F, Kf = cfg.n_fields, cfg.factor
    w_full = np.zeros((cfg.n_features,), np.float32)
    v_full = np.zeros((cfg.n_features, F, Kf), np.float32)
    table = np.asarray(state.table)
    uids = plan.uids[: plan.n_unique]
    w_full[uids] = table[: plan.n_unique, 0]
    v_full[uids] = table[: plan.n_unique, 1 : 1 + F * Kf].reshape(-1, F, Kf)
    return {
        "w0": jnp.asarray(float(state.w0)),
        "w": jnp.asarray(w_full),
        "v": jnp.asarray(v_full),
    }
