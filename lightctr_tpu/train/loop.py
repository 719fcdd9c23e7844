"""Generic training loop: one jitted (grad -> optimizer -> apply) step.

The TPU replacement of the reference's per-model Train() drivers
(train_fm_algo.cpp:35-61, dl_algo_abst.h:56-130): instead of a thread pool
with Hogwild accumulation and a barrier per batch, the whole step is a
single compiled XLA program; data parallelism is expressed by sharding the
batch (parallel/), not by per-thread row chunks.
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import sparse_batches
from ..nn.activations import sigmoid
from ..utils.metrics import MetricAccumulator
from .. import optim


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array


def make_train_step(model, cfg, tx) -> Callable:
    """Returns jitted step: (state, batch) -> (state, loss)."""

    def step(state: TrainState, batch: dict):
        rng, sub = jax.random.split(state.rng)
        loss_val, grads = jax.value_and_grad(model.loss)(state.params, batch, cfg, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optim.apply_updates(state.params, updates)
        return TrainState(params, opt_state, rng), loss_val

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, cfg) -> Callable:
    def eval_step(params, batch):
        logits = model.forward(params, batch, cfg)
        return sigmoid(logits)

    return jax.jit(eval_step)


def evaluate(model, cfg, params, ds, batch_size: int = 256) -> dict:
    """AUC / logloss / accuracy over a SparseDataset."""
    eval_step = make_eval_step(model, cfg)
    acc = MetricAccumulator()
    for batch in sparse_batches(ds, batch_size):
        scores = np.asarray(eval_step(params, batch))
        m = np.asarray(batch["row_mask"]) > 0
        acc.update(scores[m], np.asarray(batch["labels"])[m])
    return acc.result()


def train_model(
    model,
    cfg,
    train_ds,
    tx,
    epochs: int = 5,
    batch_size: int = 256,
    seed: int = 0,
    eval_ds=None,
    eval_every: int = 0,
    log: Callable[[str], None] | None = print,
    shuffle: bool = True,
) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, cfg)
    state = TrainState(params, tx.init(params), rng)
    step_fn = make_train_step(model, cfg, tx)
    np_rng = np.random.default_rng(seed) if shuffle else None

    for epoch in range(epochs):
        t0 = time.perf_counter()
        losses = []
        for batch in sparse_batches(train_ds, batch_size, rng=np_rng):
            state, loss_val = step_fn(state, batch)
            losses.append(loss_val)
        dt = time.perf_counter() - t0
        if log:
            mean_loss = float(jnp.mean(jnp.stack(losses)))
            msg = f"epoch {epoch}: loss={mean_loss:.5f} ({dt:.2f}s)"
            if eval_ds is not None and eval_every and (epoch + 1) % eval_every == 0:
                metrics = evaluate(model, cfg, state.params, eval_ds, batch_size)
                msg += f" auc={metrics['auc']:.4f} logloss={metrics['logloss']:.4f}"
            log(msg)
    return state
