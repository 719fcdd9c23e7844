"""Feature-interaction ops for sparse CTR batches — jnp/XLA reference paths.

These are the mathematical cores of FM/FFM/NFM (reference formulas at
``train_fm_algo.cpp:75-83`` sum-of-squares trick, ``train_ffm_algo.cpp:62-70``
field-aware pairs, ``train_nfm_algo.cpp:78-101`` bi-interaction pooling) —
reshaped for the TPU: everything is a masked dense einsum over padded
[B, L] batches, so XLA maps it to MXU matmuls/VPU fusions instead of the
reference's per-row AVX loops. Pallas fused variants live in
``ops/fm_pallas.py``; these jnp paths are the semantic ground truth that
kernels are tested against, and remain the CPU fallback.

Batch convention (see data/libffm.py): ids/vals/fields/mask are [B, L],
mask already folds in row validity; padded slots have mask 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_term(w: jax.Array, ids: jax.Array, xv: jax.Array) -> jax.Array:
    """sum_j w[id_j] * x_j with xv = vals*mask.  w: [n_features]."""
    return jnp.sum(w[ids] * xv, axis=-1)


def fm_interaction(v: jax.Array, ids: jax.Array, xv: jax.Array) -> jax.Array:
    """FM 2nd-order term via the sum-of-squares trick.

    0.5 * sum_k [ (sum_j v[id_j,k] x_j)^2 - sum_j (v[id_j,k] x_j)^2 ]

    v: [n_features, K]; returns [B].
    """
    vx = v[ids] * xv[..., None]                       # [B, L, K]
    s = jnp.sum(vx, axis=1)                           # [B, K]
    ss = jnp.sum(vx * vx, axis=1)                     # [B, K]
    return 0.5 * jnp.sum(s * s - ss, axis=-1)


def bi_interaction_vector(v: jax.Array, ids: jax.Array, xv: jax.Array) -> jax.Array:
    """NFM bi-interaction pooling: the per-factor-dim vector
    0.5 * [ (sum_j v x)^2 - sum_j (v x)^2 ]  -> [B, K]."""
    vx = v[ids] * xv[..., None]
    s = jnp.sum(vx, axis=1)
    ss = jnp.sum(vx * vx, axis=1)
    return 0.5 * (s * s - ss)


def field_sum_embeddings(
    v: jax.Array, ids: jax.Array, fields: jax.Array, xv: jax.Array, n_fields: int
) -> jax.Array:
    """Per-field summed embeddings  E[b,f,:] = sum_{j: field_j=f} x_j v[id_j].

    The deep-tower input of the Wide&Deep model (reference pulls per-field
    tensors from the PS, ``distributed_algo_abst.h:106-117``). One-hot
    matmul keeps it on the MXU; returns [B, F, K].
    """
    onehot = jax.nn.one_hot(fields, n_fields, dtype=v.dtype) * xv[..., None]  # [B,L,F]
    emb = v[ids]                                                              # [B,L,K]
    return jnp.einsum("blf,blk->bfk", onehot, emb)


def ffm_interaction(
    v: jax.Array, ids: jax.Array, fields: jax.Array, xv: jax.Array, n_fields: int
) -> jax.Array:
    """Field-aware FM pairwise term, exact, via field aggregation.

    Reference semantics (``train_ffm_algo.cpp:62-70``):
        sum_{j<l} dot(v[id_j, field_l], v[id_l, field_j]) * x_j * x_l

    Rewritten without the O(L^2) pair loop:
        P[b, f1, f2, :] = sum_{j: field_j = f1} x_j * v[id_j, f2, :]
        total  = sum_{f1, f2} dot(P[b,f1,f2], P[b,f2,f1])   (counts each ordered
                 pair once and j==l self-pairs once)
        self   = sum_j x_j^2 * ||v[id_j, field_j]||^2
        result = 0.5 * (total - self)

    v: [n_features, n_fields, K]; returns [B].
    """
    g = v[ids]                                                    # [B, L, F, K]
    onehot = jax.nn.one_hot(fields, n_fields, dtype=v.dtype) * xv[..., None]  # [B,L,F1]
    p = jnp.einsum("blf,blgk->bfgk", onehot, g)                   # [B, F1, F2, K]
    total = jnp.einsum("bfgk,bgfk->b", p, p)
    # self-pair term: v[id_j, field_j] gathered along the field axis
    v_own = jnp.take_along_axis(g, fields[:, :, None, None], axis=2)[:, :, 0, :]  # [B,L,K]
    self_term = jnp.sum(jnp.sum(v_own * v_own, axis=-1) * xv * xv, axis=-1)
    return 0.5 * (total - self_term)


def ffm_interaction_chunked(
    v: jax.Array,
    ids: jax.Array,
    fields: jax.Array,
    xv: jax.Array,
    n_fields: int,
    chunk: int = 8,
) -> jax.Array:
    """Memory-bounded FFM pairwise term: identical math to
    `ffm_interaction`, but the [B, L, F, K] gather is never materialised —
    a lax.scan walks destination-field chunks, gathering only
    v[ids, f2_block] per step. Peak live memory O(B*L*chunk*K) for the
    gather; use when B*L*F*K exceeds comfortable HBM (SURVEY.md §7
    "FFM memory" flag).
    """
    b, L = ids.shape
    K = v.shape[-1]
    onehot = jax.nn.one_hot(fields, n_fields, dtype=v.dtype) * xv[..., None]  # [B,L,F1]
    n_chunks = (n_fields + chunk - 1) // chunk
    f_pad = n_chunks * chunk

    def body(carry, c):
        f2 = jnp.minimum(c * chunk + jnp.arange(chunk), n_fields - 1)  # [chunk]
        gc = v[ids[..., None], f2[None, None, :]]                 # [B,L,chunk,K]
        p_c = jnp.einsum("blf,blck->bfck", onehot, gc)            # [B,F1,chunk,K]
        return carry, p_c

    _, p_chunks = jax.lax.scan(body, 0, jnp.arange(n_chunks))
    p = jnp.moveaxis(p_chunks, 0, 2)                 # [B, F1, n_chunks, chunk, K]
    p = p.reshape(b, n_fields, f_pad, K)[:, :, :n_fields, :]
    total = jnp.einsum("bfgk,bgfk->b", p, p)
    v_own = v[ids, fields]                                        # [B, L, K]
    self_term = jnp.sum(jnp.sum(v_own * v_own, axis=-1) * xv * xv, axis=-1)
    return 0.5 * (total - self_term)
