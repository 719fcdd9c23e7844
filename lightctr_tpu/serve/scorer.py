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


def make_scorer(model, cfg, params) -> Callable:
    # params go through the jit boundary as ARGUMENTS (device-resident),
    # not closure constants: on the tunneled stack closure constants are
    # serialised into the remote-compile payload, which caps out around
    # big embedding tables (measured: the FFM [V, F*K] table at V=1M is
    # ~1.1 GB -> repeated 25-min broken-pipe compiles; see
    # make_ffm_kernel_scorer below and PARITY.md serving notes)
    params = jax.device_put(params)

    @jax.jit
    def score_with(params, batch):
        return sigmoid(model.forward(params, batch, cfg))

    def score(batch):
        return score_with(params, batch)

    return score


def make_ffm_kernel_scorer(cfg, params, batch_size: int,
                           seq_len: int) -> Callable:
    """FFM scorer through the COUNT-MATRIX kernel formulation instead of
    the dense [B, L, F, K] forward: per-batch device dedup -> one row
    gather -> C = count_matrix scatter -> S = C @ rows MXU matmul ->
    pairwise identity. Identical probabilities to the dense forward
    (tests/test_two_stage_serve.py::test_ffm_kernel_scorer_matches_dense).

    Since r4 the DENSE scorer is the faster product FFM path (92k ex/s
    at B=4096 — the r3 "compile pathology" was closure-captured params
    in the remote-compile payload, fixed in make_scorer above). This
    formulation stays for regimes where [B, L, F, K] cannot fit; note
    its count matrix is [B*F, capacity] — capacity grows with B*L, so
    it is a SMALL-batch tool (B<=512 at L=64/F=68 on a 16 GB chip).

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


def batch_score(
    model,
    cfg,
    params,
    ds: SparseDataset,
    batch_size: int = 512,
    dump_path: str | None = None,
    engine: str = "dense",
) -> dict:
    """Score a dataset; returns {auc, logloss, accuracy}; optionally dumps
    one probability per line (reference prediction dump format,
    fm_predict.cpp:79-89)."""
    if engine == "kernel":
        score = make_ffm_kernel_scorer(cfg, params, batch_size,
                                       ds.ids.shape[1])
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
