"""PCA — dimensionality reduction + principal-component removal.

Capability parity with the reference's GHA-based PCA trainer
(util/pca.h:15-106: iterative Generalized Hebbian rule, reduceDimension:63,
remove_pc:71 for sentence-embedding post-processing). On TPU the exact
SVD is a single jitted call — strictly stronger than the stochastic GHA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fit(x: jax.Array, n_components: int):
    """Returns (components [C, D], mean [D], explained_variance [C])."""
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    comps = vt[:n_components]
    ev = (s[:n_components] ** 2) / jnp.maximum(x.shape[0] - 1, 1)
    return comps, mean, ev


def reduce_dimension(x: jax.Array, components: jax.Array, mean: jax.Array):
    """Project onto components (reference reduceDimension semantics)."""
    return (jnp.asarray(x, jnp.float32) - mean) @ components.T


def remove_pc(x: jax.Array, n_remove: int = 1):
    """Remove the top principal components (the SIF 'remove_pc' trick the
    reference applies to sentence embeddings, pca.h:71-106)."""
    x = jnp.asarray(x, jnp.float32)
    comps, mean, _ = fit(x, n_remove)
    xc = x - mean
    return xc - (xc @ comps.T) @ comps + mean
