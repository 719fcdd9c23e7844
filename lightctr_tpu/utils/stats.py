"""Statistics helpers — normal CDF/inverse CDF, sample sizing, RNG utils.

Capability parity with util/significance.h (erf approx :10-42, ReverseCDF
bisection :44-74) and util/random.h (Box-Muller :42, SampleBinary,
shuffle-pick-K, confidence-level sample size subSampleSize:86). jax.random
supplies the underlying generators; the CDF pair uses exact erf/erfinv
instead of the reference's series approximation + bisection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv


def normal_cdf(x, mean: float = 0.0, std: float = 1.0):
    return 0.5 * (1.0 + erf((jnp.asarray(x) - mean) / (std * jnp.sqrt(2.0))))


def normal_inverse_cdf(p, mean: float = 0.0, std: float = 1.0):
    return mean + std * jnp.sqrt(2.0) * erfinv(2.0 * jnp.asarray(p) - 1.0)


def sub_sample_size(
    population: int,
    confidence: float = 0.95,
    margin: float = 0.05,
    p: float = 0.5,
) -> int:
    """Sample size for a proportion at a confidence level, with finite
    population correction (subSampleSize semantics)."""
    z = float(normal_inverse_cdf(1.0 - (1.0 - confidence) / 2.0))
    n0 = z * z * p * (1.0 - p) / (margin * margin)
    n = n0 / (1.0 + (n0 - 1.0) / population)
    return int(jnp.ceil(n))


def sample_binary(rng: jax.Array, p, shape=()):
    return jax.random.bernoulli(rng, p, shape)


def gaussian(rng: jax.Array, shape=(), mean: float = 0.0, std: float = 1.0):
    return mean + std * jax.random.normal(rng, shape)


def choose_k(rng: jax.Array, n: int, k: int):
    """k distinct indices from range(n) (shuffle-select-K)."""
    return jax.random.choice(rng, n, (k,), replace=False)
