"""Diagonal-covariance Gaussian Mixture Model, log-space EM.

Capability parity with the reference's Train_GMM_Algo
(train_gmm_algo.{h,cpp}: GaussianLPDF log-density :45, log-sum-exp :19,
multithreaded M-step :83-117; reference config: 100 clusters, dim 10,
50 epochs over data/train_cluster.csv). Here the whole EM step is one
jitted program: responsibilities via logsumexp softmax, M-step via two
MXU matmuls (resp^T @ x, resp^T @ x^2) — no per-thread partial sums.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GMMConfig:
    n_clusters: int = 100
    dim: int = 10
    var_floor: float = 1e-4
    seed: int = 0


class GMMState(NamedTuple):
    log_pi: jax.Array   # [K]
    mu: jax.Array       # [K, D]
    var: jax.Array      # [K, D]


def init(rng: jax.Array, cfg: GMMConfig, x: jax.Array | None = None) -> GMMState:
    """Init means from random data points (the reference samples rows)."""
    if x is not None:
        idx = jax.random.choice(rng, x.shape[0], (cfg.n_clusters,), replace=False)
        mu = x[idx]
        var = jnp.broadcast_to(jnp.var(x, axis=0), (cfg.n_clusters, cfg.dim))
    else:
        mu = jax.random.normal(rng, (cfg.n_clusters, cfg.dim))
        var = jnp.ones((cfg.n_clusters, cfg.dim))
    return GMMState(
        log_pi=jnp.full((cfg.n_clusters,), -jnp.log(cfg.n_clusters)),
        mu=mu,
        var=jnp.maximum(var, cfg.var_floor),
    )


def log_prob(state: GMMState, x: jax.Array) -> jax.Array:
    """Per-cluster log density [N, K] (GaussianLPDF semantics)."""
    # -0.5 * sum_d [ log(2 pi var) + (x-mu)^2/var ], with the quadratic
    # expanded into matmuls: (x-mu)^2/var = x^2/var - 2 x mu/var + mu^2/var
    # precision=HIGHEST: the expansion cancels catastrophically, and TPU
    # matmuls default to bf16 passes — measured blowing the likelihood to
    # +1e9 on the v5e (benchmarks/bench_gmm_headtohead.py provenance)
    hi = jax.lax.Precision.HIGHEST
    inv_var = 1.0 / state.var                                   # [K,D]
    quad = (
        jnp.matmul(x * x, inv_var.T, precision=hi)
        - 2.0 * jnp.matmul(x, (state.mu * inv_var).T, precision=hi)
        + jnp.sum(state.mu * state.mu * inv_var, axis=-1)[None, :]
    )                                                            # [N,K]
    log_norm = jnp.sum(jnp.log(2.0 * jnp.pi * state.var), axis=-1)  # [K]
    return -0.5 * (quad + log_norm[None, :])


def em_step(state: GMMState, x: jax.Array, var_floor: float = 1e-4):
    """One EM iteration -> (new_state, mean log-likelihood)."""
    lp = log_prob(state, x) + state.log_pi[None, :]             # [N,K]
    ll = jax.scipy.special.logsumexp(lp, axis=-1)               # [N]
    resp = jnp.exp(lp - ll[:, None])                            # [N,K]
    hi = jax.lax.Precision.HIGHEST
    nk = jnp.sum(resp, axis=0) + 1e-10                          # [K]
    mu = jnp.matmul(resp.T, x, precision=hi) / nk[:, None]
    ex2 = jnp.matmul(resp.T, x * x, precision=hi) / nk[:, None]
    var = jnp.maximum(ex2 - mu * mu, var_floor)
    log_pi = jnp.log(nk / x.shape[0])
    return GMMState(log_pi=log_pi, mu=mu, var=var), jnp.mean(ll)


def fit(
    x,
    cfg: GMMConfig,
    epochs: int = 50,
    tol: float = 1e-4,
    log=None,
) -> tuple[GMMState, float]:
    """EM loop with convergence check (em_algo_abst.h:33-48 semantics)."""
    x = jnp.asarray(x, jnp.float32)
    state = init(jax.random.PRNGKey(cfg.seed), cfg, x)
    step = jax.jit(lambda s: em_step(s, x, cfg.var_floor))
    prev = -jnp.inf
    ll = prev
    for i in range(epochs):
        state, ll = step(state)
        if log:
            log(f"gmm epoch {i}: loglik={float(ll):.4f}")
        if jnp.abs(ll - prev) < tol:
            break
        prev = ll
    return state, float(ll)


def fit_scan(
    x,
    cfg: GMMConfig,
    epochs: int = 50,
    tol_total: float = 1e-3,
) -> tuple[GMMState, float, int]:
    """Whole EM loop as ONE compiled program: lax.while_loop with the
    reference's convergence semantics (em_algo_abst.h:33-48 — stop when
    the TOTAL log-likelihood moves <= tol between epochs, cap `epochs`).
    On a tunneled TPU transport the per-epoch host readback of fit()
    dominates wall time; this runs device-side and reads back once.

    Returns (state, final TOTAL log-likelihood, epochs run)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    state0 = init(jax.random.PRNGKey(cfg.seed), cfg, x)

    @jax.jit
    def run(state):
        def cond(carry):
            _, i, ll, last = carry
            return jnp.logical_and(
                i < epochs,
                jnp.logical_or(i == 0, jnp.abs(ll - last) > tol_total),
            )

        def body(carry):
            s, i, ll, _ = carry
            s2, mean_ll = em_step(s, x, cfg.var_floor)
            return s2, i + 1, mean_ll * n, ll

        s, i, ll, _ = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), -jnp.inf, -jnp.inf)
        )
        return s, ll, i

    state, ll, i = run(state0)
    return state, float(ll), int(i)


def predict(state: GMMState, x) -> jax.Array:
    """Hard cluster assignment [N] (reference Predict())."""
    lp = log_prob(state, jnp.asarray(x, jnp.float32)) + state.log_pi[None, :]
    return jnp.argmax(lp, axis=-1)
