"""K-step super-batch streaming FM == K sequential fused steps.

The super-step pulls the UNION of K minibatches' rows once, scans K
exact sub-steps in rank space (per-batch L2 masks keep regularisation
identical), and pushes once — the master-exchange amortisation for
overlapping (zipf) traffic. Equivalence is the whole point: the
trajectory must match the sequential fused steps bit-closely.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lightctr_tpu.models import fm_kernel
from lightctr_tpu.ops.embedding_pallas import TILE


def _batches(K, B, L, V, seed=0, zipf=True):
    rng = np.random.default_rng(seed)
    if zipf:
        ids = np.minimum(rng.zipf(1.3, (K, B, L)) - 1, V - 1)
    else:
        ids = rng.integers(0, V, (K, B, L))
    return (
        jnp.asarray(ids.astype(np.int32)),
        jnp.ones((K, B, L), jnp.float32),
        jnp.ones((K, B, L), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (K, B)).astype(np.float32)),
        jnp.ones((K, B), jnp.float32),
    )


def test_super_step_matches_sequential():
    K, B, L, V = 4, 64, 8, 4096
    b_pad, capacity = 128, 4 * TILE
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.2, l2=1e-3,
        interpret=True, exact=True)
    ids, vals, mask, labels, row_mask = _batches(K, B, L, V)

    # sequential baseline: K fused single-batch steps
    state_seq = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    seq_step = fm_kernel.make_streaming_train_step_fused(cfg, capacity,
                                                         b_pad)
    seq_losses = []
    for k in range(K):
        state_seq, loss = seq_step(state_seq, ids[k], vals[k], mask[k],
                                   labels[k], row_mask[k])
        seq_losses.append(float(loss))

    # super-step: one pull, K scanned sub-steps, one push
    state_sup = fm_kernel.streaming_init_packed(jax.random.PRNGKey(0), cfg)
    sup_step = fm_kernel.make_streaming_super_step_fused(cfg, capacity,
                                                         b_pad, K)
    state_sup, losses = sup_step(state_sup, ids, vals, mask, labels,
                                 row_mask)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_sup.packed),
                               np.asarray(state_seq.packed),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(state_sup.w0), float(state_seq.w0),
                               rtol=1e-5)
    assert np.isfinite(seq_losses).all()


def test_super_step_masked_rows_and_padding():
    """Partial row_mask + uniform ids (no overlap) still match."""
    K, B, L, V = 3, 32, 8, 8192
    b_pad, capacity = 128, 4 * TILE
    cfg = fm_kernel.KernelFMConfig(
        n_features=V, factor=4, learning_rate=0.1, l2=0.0,
        interpret=True, exact=True)
    ids, vals, mask, labels, row_mask = _batches(K, B, L, V, seed=3,
                                                 zipf=False)
    row_mask = row_mask.at[:, B // 2 :].set(0.0)

    state_seq = fm_kernel.streaming_init_packed(jax.random.PRNGKey(1), cfg)
    seq_step = fm_kernel.make_streaming_train_step_fused(cfg, capacity,
                                                         b_pad)
    seq_losses = []
    for k in range(K):
        state_seq, loss = seq_step(state_seq, ids[k], vals[k], mask[k],
                                   labels[k], row_mask[k])
        seq_losses.append(float(loss))

    state_sup = fm_kernel.streaming_init_packed(jax.random.PRNGKey(1), cfg)
    sup_step = fm_kernel.make_streaming_super_step_fused(cfg, capacity,
                                                         b_pad, K)
    state_sup, losses = sup_step(state_sup, ids, vals, mask, labels,
                                 row_mask)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_sup.packed),
                               np.asarray(state_seq.packed),
                               rtol=1e-4, atol=1e-6)
