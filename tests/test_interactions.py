"""Interaction ops vs brute-force pair loops (the reference formulas)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightctr_tpu.ops.interactions import (
    bi_interaction_vector,
    ffm_interaction,
    field_sum_embeddings,
    fm_interaction,
    linear_term,
)


@pytest.fixture
def toy():
    rng = np.random.default_rng(0)
    B, L, NF, F, K = 4, 8, 50, 6, 5
    ids = rng.integers(0, NF, (B, L)).astype(np.int32)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    fields = rng.integers(0, F, (B, L)).astype(np.int32)
    mask = (rng.random((B, L)) > 0.3).astype(np.float32)
    v = rng.normal(size=(NF, K)).astype(np.float32)
    vf = rng.normal(size=(NF, F, K)).astype(np.float32)
    w = rng.normal(size=(NF,)).astype(np.float32)
    return ids, vals, fields, mask, v, vf, w, (B, L, NF, F, K)


def test_linear_term(toy):
    ids, vals, fields, mask, v, vf, w, (B, L, *_ ) = toy
    xv = vals * mask
    got = np.asarray(linear_term(jnp.asarray(w), jnp.asarray(ids), jnp.asarray(xv)))
    expect = np.array(
        [sum(w[ids[b, j]] * xv[b, j] for j in range(L)) for b in range(B)]
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_fm_interaction_vs_pair_loop(toy):
    ids, vals, fields, mask, v, vf, w, (B, L, *_ ) = toy
    xv = vals * mask
    got = np.asarray(fm_interaction(jnp.asarray(v), jnp.asarray(ids), jnp.asarray(xv)))
    expect = np.zeros(B)
    for b in range(B):
        for j in range(L):
            for l in range(j + 1, L):
                expect[b] += np.dot(v[ids[b, j]], v[ids[b, l]]) * xv[b, j] * xv[b, l]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-4)


def test_bi_interaction_sums_to_fm(toy):
    ids, vals, fields, mask, v, vf, w, _ = toy
    xv = vals * mask
    pooled = np.asarray(
        bi_interaction_vector(jnp.asarray(v), jnp.asarray(ids), jnp.asarray(xv))
    )
    fm = np.asarray(fm_interaction(jnp.asarray(v), jnp.asarray(ids), jnp.asarray(xv)))
    np.testing.assert_allclose(pooled.sum(axis=-1), fm, rtol=1e-4, atol=1e-5)


def test_ffm_interaction_vs_pair_loop(toy):
    ids, vals, fields, mask, v, vf, w, (B, L, NF, F, K) = toy
    xv = vals * mask
    vf64 = vf.astype(np.float64)
    xv64 = xv.astype(np.float64)
    expect = np.zeros(B)
    for b in range(B):
        for j in range(L):
            for l in range(j + 1, L):
                expect[b] += (
                    np.dot(vf64[ids[b, j], fields[b, l]], vf64[ids[b, l], fields[b, j]])
                    * xv64[b, j]
                    * xv64[b, l]
                )
    # exact parity in float64 (the rewrite is algebraically identical; the
    # fp32 path differs only by accumulation-order rounding)
    import jax

    with jax.enable_x64():
        got64 = np.asarray(
            ffm_interaction(
                jnp.asarray(vf, jnp.float64),
                jnp.asarray(ids),
                jnp.asarray(fields),
                jnp.asarray(xv, jnp.float64),
                F,
            )
        )
    np.testing.assert_allclose(got64, expect, rtol=1e-10)
    got32 = np.asarray(
        ffm_interaction(
            jnp.asarray(vf), jnp.asarray(ids), jnp.asarray(fields), jnp.asarray(xv), F
        )
    )
    np.testing.assert_allclose(got32, expect, rtol=5e-2, atol=5e-2)


def test_ffm_chunked_matches_full(toy):
    from lightctr_tpu.ops.interactions import ffm_interaction_chunked

    ids, vals, fields, mask, v, vf, w, (B, L, NF, F, K) = toy
    xv = vals * mask
    full = np.asarray(
        ffm_interaction(
            jnp.asarray(vf), jnp.asarray(ids), jnp.asarray(fields), jnp.asarray(xv), F
        )
    )
    for chunk in (2, 4, 7):
        got = np.asarray(
            ffm_interaction_chunked(
                jnp.asarray(vf), jnp.asarray(ids), jnp.asarray(fields),
                jnp.asarray(xv), F, chunk=chunk,
            )
        )
        np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-4)


def test_field_sum_embeddings_vs_loop(toy):
    ids, vals, fields, mask, v, vf, w, (B, L, NF, F, K) = toy
    xv = vals * mask
    got = np.asarray(
        field_sum_embeddings(
            jnp.asarray(v), jnp.asarray(ids), jnp.asarray(fields), jnp.asarray(xv), F
        )
    )
    expect = np.zeros((B, F, K), np.float32)
    for b in range(B):
        for j in range(L):
            expect[b, fields[b, j]] += xv[b, j] * v[ids[b, j]]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
