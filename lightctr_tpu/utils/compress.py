"""Compression: quantile intN codec, product quantizer, low-bit quantize.

Capability parity with the reference's wire/storage compressors:
  - QuantileCompress (util/quantile_compress.h:23-158): fp32 -> intN by CDF
    quantile tables, UNIFORM/LOG/NORMAL distributions; binary-search encode
    becomes one vectorised jnp.searchsorted. CUSTOM_DISTRIBUT
    (quantile_compress.h:65-105 with significance.h CustomCDF/ReverseCDF)
    is the N(mu, sigma) table over an observed [lo, hi] range; `fit()`
    builds it from data (mu/sigma/range estimated from the values), and the
    extra 'empirical' mode goes further: table entries straight from the
    observed value CDF's quantiles.
  - Product_quantizer (util/product_quantizer.h:47-194): split the embedding
    dim into parts, k-means per part (with empty-cluster splitting
    :166-185), uint8 codes. K-means here is jitted E/M over all parts at
    once (vmap) instead of per-part scalar loops.
  - lowbit_quantize (product_quantizer.h:24): 1/2-bit sign/magnitude codes.
These are the int8/DCN-exchange hooks referenced by parallel/collectives.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv


# ---------------------------------------------------------------------------
# Quantile compression (intN via distribution tables)


def _uniform_table(n_levels: int):
    return jnp.linspace(-1.0, 1.0, n_levels)


def _log_table(n_levels: int):
    half = n_levels // 2
    mags = jnp.exp(jnp.linspace(jnp.log(1e-4), 0.0, half))
    return jnp.concatenate([-mags[::-1], mags])


def _normal_table(n_levels: int):
    # midpoint quantiles of N(0,1): Phi^-1((i+0.5)/n) = sqrt(2) erfinv(2p-1)
    p = (jnp.arange(n_levels) + 0.5) / n_levels
    return jnp.sqrt(2.0) * erfinv(2.0 * p - 1.0)


def _custom_table(n_levels: int, mu: float, sigma: float, lo: float, hi: float):
    """N(mu, sigma) inverse-CDF table over [lo, hi].

    Mirrors the reference's CUSTOM_DISTRIBUT init (quantile_compress.h:81,
    101-105): minCDF = Phi((lo-mu)/sigma), maxCDF = Phi((hi-mu)/sigma),
    entry i = ReverseCDF(minCDF + i*delta, mu, sigma) with entry 0 pinned
    to lo. The reference's bisection ReverseCDF (significance.h:44-60) is
    the closed form mu + sigma*sqrt(2)*erfinv(2p-1) here.
    """
    lo_p = 0.5 * (1.0 + erf((lo - mu) / (sigma * jnp.sqrt(2.0))))
    hi_p = 0.5 * (1.0 + erf((hi - mu) / (sigma * jnp.sqrt(2.0))))
    delta = (hi_p - lo_p) / n_levels
    p = lo_p + jnp.arange(n_levels) * delta
    t = mu + sigma * jnp.sqrt(2.0) * erfinv(jnp.clip(2.0 * p - 1.0, -1 + 1e-7, 1 - 1e-7))
    return t.at[0].set(lo)


@dataclasses.dataclass(frozen=True)
class QuantileCompress:
    """Encode fp32 in [-scale, scale] to intN level indices.

    'custom' is the reference's CUSTOM_DISTRIBUT: an N(mu, sigma) quantile
    table over [lo, hi] — use `QuantileCompress.fit(values, ...)` to build
    it from observed data. 'empirical' stores the observed CDF's own
    quantiles as the table (fit-only; strictly data-driven).
    """

    n_bits: int = 8
    distribution: str = "uniform"  # 'uniform' | 'log' | 'normal' | 'custom' | 'empirical'
    scale: float = 1.0
    mu: float = 0.0
    sigma: float = 1.0
    lo: float = -1.0
    hi: float = 1.0
    table_values: tuple | None = None  # 'empirical' mode: the fitted table

    @classmethod
    def fit(cls, values, n_bits: int = 8, distribution: str = "custom"):
        """Build a data-driven compressor from observed values.

        distribution='custom': estimate mu/sigma/lo/hi and use the normal
        inverse-CDF table (reference CUSTOM_DISTRIBUT semantics).
        distribution='empirical': table = midpoint quantiles of the observed
        value CDF itself (no distributional assumption).
        """
        v = np.asarray(values, np.float64).reshape(-1)
        assert v.size > 1, "fit needs at least 2 observed values"
        lo, hi = float(v.min()), float(v.max())
        assert hi > lo, "fit needs a non-degenerate value range"
        if distribution == "empirical":
            n_levels = 1 << n_bits
            q = (np.arange(n_levels) + 0.5) / n_levels
            tbl = np.quantile(v, q)
            tbl = np.maximum.accumulate(tbl)  # monotone even under fp ties
            return cls(
                n_bits=n_bits,
                distribution="empirical",
                lo=lo,
                hi=hi,
                table_values=tuple(float(x) for x in tbl),
            )
        assert distribution == "custom", distribution
        mu = float(v.mean())
        sigma = float(max(v.std(), 1e-12))
        return cls(
            n_bits=n_bits, distribution="custom", mu=mu, sigma=sigma, lo=lo, hi=hi
        )

    def table(self) -> jax.Array:
        n_levels = 1 << self.n_bits
        if self.distribution == "log":
            t = _log_table(n_levels)
        elif self.distribution == "normal":
            t = _normal_table(n_levels)
            t = t / jnp.max(jnp.abs(t))
        elif self.distribution == "custom":
            return _custom_table(n_levels, self.mu, self.sigma, self.lo, self.hi)
        elif self.distribution == "empirical":
            assert self.table_values is not None, (
                "'empirical' requires QuantileCompress.fit(values, ...)"
            )
            assert len(self.table_values) == n_levels
            return jnp.asarray(self.table_values, jnp.float32)
        else:
            t = _uniform_table(n_levels)
        return t * self.scale

    def encode(self, x: jax.Array) -> jax.Array:
        t = self.table()
        mids = (t[1:] + t[:-1]) * 0.5
        idx = jnp.searchsorted(mids, jnp.asarray(x, jnp.float32).reshape(-1))
        return idx.astype(jnp.uint8 if self.n_bits <= 8 else jnp.int32).reshape(
            jnp.shape(x)
        )

    def decode(self, codes: jax.Array) -> jax.Array:
        return self.table()[codes.astype(jnp.int32)]


# ---------------------------------------------------------------------------
# k-means (vmapped over PQ parts)


def _kmeans_one(x, k, n_iters, rng):
    """x [N, D] -> (centroids [K, D], assignment [N])."""
    n = x.shape[0]
    idx = jax.random.choice(rng, n, (k,), replace=False)
    cent = x[idx]

    def step(cent, _):
        d2 = (
            jnp.sum(x * x, axis=1)[:, None]
            - 2.0 * x @ cent.T
            + jnp.sum(cent * cent, axis=1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)        # [N,K]
        counts = jnp.sum(onehot, axis=0)                          # [K]
        sums = onehot.T @ x                                       # [K,D]
        new_cent = sums / jnp.maximum(counts[:, None], 1.0)
        # empty-cluster handling: respawn at the point farthest from its
        # centroid (the reference splits the biggest cluster :166-185)
        far = x[jnp.argmax(jnp.min(d2, axis=1))]
        new_cent = jnp.where(counts[:, None] > 0, new_cent, far[None, :])
        return new_cent, None

    cent, _ = jax.lax.scan(step, cent, None, length=n_iters)
    d2 = (
        jnp.sum(x * x, axis=1)[:, None]
        - 2.0 * x @ cent.T
        + jnp.sum(cent * cent, axis=1)[None, :]
    )
    return cent, jnp.argmin(d2, axis=1)


def kmeans(x, k: int, n_iters: int = 25, seed: int = 0):
    return jax.jit(_kmeans_one, static_argnums=(1, 2))(
        jnp.asarray(x, jnp.float32), k, n_iters, jax.random.PRNGKey(seed)
    )


# ---------------------------------------------------------------------------
# Product quantizer


@dataclasses.dataclass
class ProductQuantizer:
    n_parts: int = 20
    n_clusters: int = 64
    n_iters: int = 25
    seed: int = 0
    codebooks: np.ndarray | None = None  # [P, K, d_part]

    def train(self, x) -> np.ndarray:
        """x [N, D] with D % n_parts == 0 -> uint8 codes [N, P]."""
        x = jnp.asarray(x, jnp.float32)
        n, d = x.shape
        assert d % self.n_parts == 0, f"dim {d} not divisible by {self.n_parts}"
        dp = d // self.n_parts
        parts = x.reshape(n, self.n_parts, dp).transpose(1, 0, 2)  # [P,N,dp]
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.n_parts)
        cents, assigns = jax.jit(
            jax.vmap(_kmeans_one, in_axes=(0, None, None, 0)),
            static_argnums=(1, 2),
        )(parts, self.n_clusters, self.n_iters, keys)
        self.codebooks = np.asarray(cents)
        return np.asarray(assigns.T.astype(jnp.uint8))            # [N, P]

    def encode(self, x) -> np.ndarray:
        assert self.codebooks is not None
        x = jnp.asarray(x, jnp.float32)
        n, d = x.shape
        dp = d // self.n_parts
        parts = x.reshape(n, self.n_parts, dp)
        cb = jnp.asarray(self.codebooks)                          # [P,K,dp]
        d2 = (
            jnp.sum(parts * parts, axis=-1)[..., None]
            - 2.0 * jnp.einsum("npd,pkd->npk", parts, cb)
            + jnp.sum(cb * cb, axis=-1)[None, :, :]
        )
        return np.asarray(jnp.argmin(d2, axis=-1).astype(jnp.uint8))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        cb = self.codebooks                                       # [P,K,dp]
        parts = cb[np.arange(self.n_parts)[None, :], codes.astype(np.int64)]  # [N,P,dp]
        return parts.reshape(codes.shape[0], -1)


# ---------------------------------------------------------------------------
# Low-bit (1/2-bit) quantization


def lowbit_quantize(x, n_bits: int = 1):
    """1-bit: sign * mean(|x|); 2-bit: sign * 2-level magnitudes.
    Returns (codes uint8, scales) with decode via lowbit_dequantize."""
    x = jnp.asarray(x, jnp.float32)
    if n_bits == 1:
        scale = jnp.mean(jnp.abs(x))
        codes = (x > 0).astype(jnp.uint8)
        return codes, scale

    mag = jnp.abs(x)
    thresh = jnp.mean(mag)
    hi = jnp.sum(jnp.where(mag >= thresh, mag, 0.0)) / jnp.maximum(
        jnp.sum(mag >= thresh), 1
    )
    lo = jnp.sum(jnp.where(mag < thresh, mag, 0.0)) / jnp.maximum(
        jnp.sum(mag < thresh), 1
    )
    codes = ((x > 0).astype(jnp.uint8) << 1) | (mag >= thresh).astype(jnp.uint8)
    return codes, jnp.stack([lo, hi])


def lowbit_dequantize(codes, scales, n_bits: int = 1):
    if n_bits == 1:
        return jnp.where(codes > 0, scales, -scales)
    sign = jnp.where((codes >> 1) > 0, 1.0, -1.0)
    mag = jnp.where((codes & 1) > 0, scales[1], scales[0])
    return sign * mag
