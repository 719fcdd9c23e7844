"""Batch scoring — the TPU serving path (reference: predict/fm_predict.cpp
scorer semantics: score a test file, report logloss/accuracy/AUC, dump
predictions; without replicating the reference loader's dropped-first-
feature quirk, fm_predict.cpp:117-127).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax

from ..data.batching import sparse_batches
from ..data.libffm import SparseDataset
from ..nn.activations import sigmoid
from ..utils.metrics import MetricAccumulator


def make_scorer(model, cfg, params, compute_dtype=None) -> Callable:
    # params go through the jit boundary as ARGUMENTS (device-resident),
    # not closure constants: on the tunneled stack closure constants are
    # serialised into the remote-compile payload, which caps out around
    # big embedding tables (measured: the FFM [V, F*K] table at V=1M is
    # ~1.1 GB -> repeated 25-min broken-pipe compiles; see
    # make_ffm_kernel_scorer below and PARITY.md serving notes)
    #
    # compute_dtype=jnp.bfloat16: SERVING-grade fast path — float params
    # and batch values are cast once on device and the whole forward
    # (embedding gather + glue einsums) runs in bf16, halving the HBM
    # traffic the dense FFM forward is bound by; logits return in f32.
    # Training numerics stay f32 — this knob exists only where the
    # output is a probability (abs error ~1e-2; PARITY.md serving table).
    import jax.numpy as jnp

    params = jax.device_put(params)

    @jax.jit
    def score_with(params, batch):
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            batch = {
                k: v.astype(compute_dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in batch.items()
            }
        z = model.forward(params, batch, cfg)
        return sigmoid(z.astype(jnp.float32))

    def score(batch):
        return score_with(params, batch)

    return score


def make_scan_scorer(model, cfg, params, compute_dtype=None) -> Callable:
    """Score K STACKED batches in ONE dispatch: a lax.scan over the
    leading axis of {k: [K, B, ...]} batch arrays, one device sync for
    the whole stack. The dataset-scoring path — the reference's
    predictor scores a whole test FILE (fm_predict.cpp:59-90), and on
    a dispatch-bound transport the per-batch fixed cost (~25 ms
    dispatch+readback at B=4096 on the tunneled stack, PARITY.md
    serving table) amortises K-fold. Returns score(batches) ->
    [K, B] probabilities. Same numerics as make_scorer per batch
    (tests/test_two_stage_serve.py::test_scan_scorer_matches_per_batch).
    """
    import jax.numpy as jnp

    params = jax.device_put(params)

    @jax.jit
    def score_with(params, batches):
        if compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            batches = {
                k: v.astype(compute_dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in batches.items()
            }

        def body(carry, b):
            return carry, sigmoid(
                model.forward(params, b, cfg).astype(jnp.float32))

        _, probs = jax.lax.scan(body, None, batches)
        return probs

    def score(batches):
        return score_with(params, batches)

    return score


def make_ffm_kernel_scorer(cfg, params, batch_size: int,
                           seq_len: int) -> Callable:
    """FFM scorer through the COUNT-MATRIX kernel formulation instead of
    the dense [B, L, F, K] forward: per-batch device dedup -> one row
    gather -> C = count_matrix scatter -> S = C @ rows MXU matmul ->
    pairwise identity. Identical probabilities to the dense forward
    (tests/test_two_stage_serve.py::test_ffm_kernel_scorer_matches_dense).

    Since r4 the DENSE scorer is the faster product FFM path (~90k ex/s
    at B=4096 — the r3 "compile pathology" was closure-captured params
    in the remote-compile payload, fixed in make_scorer above).

    When this formulation wins — the shape arithmetic (r5, retiring the
    untested "huge-L" rationale VERDICT r4 weak #5 flagged): its count
    matrix C is [B*F, R] vs the dense forward's [B*L, F*K] transient,
    ratio R / (L*K). The kernel scorer is SMALLER only when the batch's
    unique-id count R < L*K (e.g. < 256 at L=64/K=4) — extreme-dedup
    traffic (hot-head burst serving), NOT large L: growing L grows
    R toward min(B*L, V) at least as fast as it grows the dense
    transient, so there is no feasible-for-kernel, infeasible-for-dense
    L at production vocabularies. Within its feasible shapes it also
    measured slower (B=512: 9.8k vs dense 16.4k ex/s, PARITY.md) — it
    stays as tested capability for the R << L*K corner.

    cfg: models.ffm.FFMConfig; params: the dense {w0, w [V], v [V,F,K]}
    dict. Shapes are static per (batch_size, seq_len).
    """
    import jax.numpy as jnp

    from ..models import ffm_kernel
    from ..ops.embedding_pallas import TILE

    kcfg = ffm_kernel.KernelFFMConfig(
        n_features=cfg.n_features, n_fields=cfg.n_fields,
        factor=cfg.factor, exact=True, agg=True)
    Dw = kcfg.row_width
    F, Kf = cfg.n_fields, cfg.factor
    n = batch_size * seq_len
    capacity = (min(n, cfg.n_features) + 2 + 2 * TILE - 1) \
        // (2 * TILE) * (2 * TILE)

    # vocab-space packed table [V, Dw]: [w | V(F*K) | pad]. Built ONCE,
    # device-resident, and passed as a runtime ARGUMENT: as a closure
    # constant the ~V*Dw*4-byte table rides the remote-compile payload
    # on this tunneled stack and kills it (HTTP 413 / 25-min broken
    # pipes — same lesson as the agg trainer's count matrix and the
    # two-stage bench's item catalogue, PARITY.md serving notes).
    V = cfg.n_features
    table = jnp.zeros((V, Dw))
    table = table.at[:, 0].set(params["w"])
    table = table.at[:, 1 : 1 + F * Kf].set(
        jnp.asarray(params["v"]).reshape(V, F * Kf))
    table = jax.device_put(table)
    w0 = jnp.asarray(params["w0"])

    @jax.jit
    def score_with(table, w0, batch):
        b = ffm_kernel.plan_batch_on_device.__wrapped__(
            batch["ids"].astype(jnp.int32), batch["vals"], batch["mask"],
            batch["fields"], jnp.zeros((batch_size,)),
            jnp.ones((batch_size,)), capacity=capacity)
        rows = table[b["uids"]]
        rows = rows.at[capacity - 1].set(0.0)
        C = ffm_kernel.count_matrix(b["ranks"], b["fields"], b["xv"],
                                    capacity, F, jnp.float32)
        z = ffm_kernel._logits_from_counts(rows, w0, C, b["ranks"],
                                           b["fields"], b["xv"], kcfg)
        return sigmoid(z)

    def score(batch):
        return score_with(table, w0, batch)

    return score


def make_ffm_grouped_scorer(cfg, params, max_groups: int = 4,
                            slot_pad: int = 128, exact: bool = True,
                            slack: float = 1.2) -> Callable:
    """Forward-only FFM scorer through the GROUPED active-width engine
    (the 0.5 ms trainer path of models/ffm_kernel.make_train_step_grouped
    minus backward/optimizer): per batch, a host plan dedups ids into the
    size-grouped field-blocked layout, ONE row gather pulls the touched
    vocab rows into active-width rank space, and the per-group
    block-diagonal einsums produce the logits. Identical probabilities to
    the dense scorer (tests/test_two_stage_serve.py
    ::test_ffm_grouped_scorer_matches_dense).

    Where it wins: traffic whose unique-id count is well below the
    position count (zipf/production skew, bundled-style data) — the MXU
    reads each unique row once instead of per occurrence, and the pull
    gather shrinks by the dedup factor. At uniform-random B=4096/V=1M
    (uniques ~= positions) the dedup factor is ~1.1x and the dense
    forward's position gather is the same data volume — measured
    head-to-head in benchmarks/bench_scoring.py (PARITY.md serving
    table). Reference predictor being matched:
    /root/reference/LightCTR/predict/fm_predict.cpp:18-53.

    Compile discipline: the grouped layout (field permutation, group
    spans, slot capacities) is CALIBRATED from the first batch with
    `slack` headroom and FROZEN (ffm_kernel.layout_from_batch); each
    batch is planned into it with plain dedup (plan_into_layout), so
    steady traffic runs ONE compiled program. A capacity breach
    re-calibrates loudly — `score.state["replans"]` counts
    re-calibrations and `score.compile_keys` the distinct compiled
    programs, so callers can audit churn (each fresh program is a
    3-7 min remote compile on the tunneled stack). The packed
    [V, Dw] vocab table is built once and rides the jit boundary as a
    runtime argument (closure constants are remote-compile payload —
    CLAUDE.md / NEXT_STEPS r4).

    exact=False streams the einsums in bf16 with f32 accumulation
    (serving-grade: probabilities match to ~1e-2; train-grade numerics
    stay fp32).
    """
    import functools

    import jax.numpy as jnp

    from ..models import ffm_kernel

    F, Kf, V = cfg.n_fields, cfg.factor, cfg.n_features
    Dw = 1 + F * Kf
    cdt = jnp.float32 if exact else jnp.bfloat16

    table = jnp.zeros((V, Dw))
    table = table.at[:, 0].set(jnp.asarray(params["w"]))
    table = table.at[:, 1:].set(jnp.asarray(params["v"]).reshape(V, F * Kf))
    table = jax.device_put(table)
    w0 = jnp.asarray(params["w0"])

    compiled: dict = {}

    def build(key):
        n_active, f_start, f_end, r_g, row_offset = key
        Dwa = 1 + n_active * Kf

        @jax.jit
        def score_with(table, w0, col_ids, uids_flat, new_field, slots, xv):
            # one pull for every group: [n_rows_total, Dw] -> active-width
            # columns in PERMUTED field order (col_ids maps new->old).
            # Pad slots pull row 0 — harmless: their count-matrix and
            # Crow2 columns are identically zero (same argument as the
            # trainer's inert pad-slot noise, init_grouped).
            rows = table[uids_flat][:, col_ids]          # [n_rows, Dwa]
            Cs = ffm_kernel.count_matrices_grouped_arrays(
                new_field, slots, xv, f_start, f_end, r_g, cdt)
            Crow2s = ffm_kernel.count_matrices_grouped_arrays(
                new_field, slots, xv * xv, f_start, f_end, r_g, cdt)
            z = ffm_kernel._logits_from_counts_grouped_core(
                rows, w0, Cs, Crow2s, n_active, Kf, cdt,
                f_start, f_end, r_g, row_offset)
            return sigmoid(z)

        return score_with

    state = {"layout": None, "col_ids": None, "replans": 0}

    def score(batch):
        ids = np.asarray(batch["ids"])
        vals = np.asarray(batch["vals"])
        mask = np.asarray(batch["mask"])
        fields = np.asarray(batch["fields"])
        for _ in range(2):
            if state["layout"] is None:
                layout = ffm_kernel.layout_from_batch(
                    ids, mask, fields, F, slot_pad=slot_pad,
                    max_groups=max_groups, slack=slack)
                assert layout is not None, (
                    "batch ids do not partition into fields — use the "
                    "dense scorer (make_scorer) for multi-field features")
                state["layout"] = layout
                state["replans"] += 1
                # active-width column map in permuted field order
                active_old = layout.inv_perm[: layout.n_active]
                state["col_ids"] = np.concatenate(
                    [[0]] + [1 + of * Kf + np.arange(Kf)
                             for of in active_old]).astype(np.int32)
            layout = state["layout"]
            new_field, slots, uids_flat, ok = ffm_kernel.plan_into_layout(
                layout, ids, mask, fields)
            if ok:
                break
            state["layout"] = None       # overflow: re-calibrate loudly
        else:
            raise AssertionError(
                "batch does not fit a layout calibrated from itself")
        key = (layout.n_active, layout.f_start, layout.f_end,
               layout.r_g, layout.row_offset)
        if key not in compiled:
            compiled[key] = build(key)
        xv = (vals * mask).astype(np.float32)
        return compiled[key](
            table, w0, jnp.asarray(state["col_ids"]),
            jnp.asarray(uids_flat), jnp.asarray(new_field),
            jnp.asarray(slots), jnp.asarray(xv))

    score.compile_keys = compiled
    score.state = state
    return score


def batch_score(
    model,
    cfg,
    params,
    ds: SparseDataset,
    batch_size: int = 512,
    dump_path: str | None = None,
    engine: str = "dense",
    scan: int | None = None,
) -> dict:
    """Score a dataset; returns {auc, logloss, accuracy}; optionally dumps
    one probability per line (reference prediction dump format,
    fm_predict.cpp:79-89).

    scan=K stacks K batches per device dispatch (make_scan_scorer) —
    the dataset-scoring throughput path: one dispatch + one readback
    per stack amortises the per-batch fixed cost (measured 2.2-3x at
    B=4096 on the tunneled stack, PARITY.md serving table). Identical
    metrics/predictions to per-batch scoring."""
    if scan:
        assert engine == "dense", "scan scoring uses the dense forward"
        score_many = make_scan_scorer(model, cfg, params)
        acc = MetricAccumulator()
        preds = []
        group: list[dict] = []

        def flush():
            import jax.numpy as jnp

            k_real = len(group)
            g = group + [
                {k: np.zeros_like(group[0][k]) for k in group[0]}
            ] * (scan - k_real)
            stacked = {k: jnp.asarray(np.stack([b[k] for b in g]))
                       for k in g[0]}
            probs = np.asarray(score_many(stacked))
            for i in range(k_real):
                m = np.asarray(group[i]["row_mask"]) > 0
                acc.update(probs[i][m],
                           np.asarray(group[i]["labels"])[m])
                preds.append(probs[i][m])
            group.clear()

        for batch in sparse_batches(ds, batch_size):
            group.append({k: np.asarray(v) for k, v in batch.items()})
            if len(group) == scan:
                flush()
        if group:
            flush()
        if dump_path:
            allp = np.concatenate(preds)
            with open(dump_path, "w") as f:
                for p in allp:
                    f.write(f"{float(p):.6f}\n")
        return acc.result()

    if engine == "kernel":
        score = make_ffm_kernel_scorer(cfg, params, batch_size,
                                       ds.ids.shape[1])
    elif engine == "grouped":
        score = make_ffm_grouped_scorer(cfg, params)
    else:
        score = make_scorer(model, cfg, params)
    acc = MetricAccumulator()
    preds: list[np.ndarray] = []
    for batch in sparse_batches(ds, batch_size):
        s = np.asarray(score(batch))
        m = np.asarray(batch["row_mask"]) > 0
        acc.update(s[m], np.asarray(batch["labels"])[m])
        preds.append(s[m])
    if dump_path:
        allp = np.concatenate(preds)
        with open(dump_path, "w") as f:
            for p in allp:
                f.write(f"{float(p):.6f}\n")
    return acc.result()
