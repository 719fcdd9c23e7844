"""PLSA topic model — EM over a bag-of-words count matrix.

Capability parity with the reference's Train_TM_Algo
(train_tm_algo.{h,cpp}: E-step latent p(topic|doc,word) :62-127, M-step
re-estimating p(word|topic), p(topic|doc) :129-168; reference config: 24
topics x 5000 words). The collapsed update used here folds the E-step
posterior into the M-step sums, so one iteration is three einsums over a
dense [D, W] count matrix — no [D, W, T] tensor is materialised.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PLSAConfig:
    n_topics: int = 24
    n_words: int = 5000
    seed: int = 0
    eps: float = 1e-10


class PLSAState(NamedTuple):
    p_w_t: jax.Array  # [T, W] p(word|topic)
    p_t_d: jax.Array  # [D, T] p(topic|doc)


def init(rng: jax.Array, cfg: PLSAConfig, n_docs: int) -> PLSAState:
    k1, k2 = jax.random.split(rng)
    p_w_t = jax.random.uniform(k1, (cfg.n_topics, cfg.n_words)) + 0.1
    p_t_d = jax.random.uniform(k2, (n_docs, cfg.n_topics)) + 0.1
    return PLSAState(
        p_w_t=p_w_t / jnp.sum(p_w_t, axis=1, keepdims=True),
        p_t_d=p_t_d / jnp.sum(p_t_d, axis=1, keepdims=True),
    )


def em_step(state: PLSAState, counts: jax.Array, eps: float = 1e-10):
    """counts: [D, W] word counts -> (new_state, loglik)."""
    # joint[d,w] = sum_t p(t|d) p(w|t); posterior-weighted counts:
    # n(d,w) * p(t|d)p(w|t) / joint — accumulated directly into M sums.
    joint = state.p_t_d @ state.p_w_t                     # [D,W]
    ll = jnp.sum(counts * jnp.log(joint + eps))
    ratio = counts / (joint + eps)                        # [D,W]
    # p(w|t) new ∝ p(w|t) * (p_t_d^T @ ratio)   [T,W]
    pwt_new = state.p_w_t * (state.p_t_d.T @ ratio)
    pwt_new = pwt_new / (jnp.sum(pwt_new, axis=1, keepdims=True) + eps)
    # p(t|d) new ∝ p(t|d) * (ratio @ p_w_t^T)   [D,T]
    ptd_new = state.p_t_d * (ratio @ state.p_w_t.T)
    ptd_new = ptd_new / (jnp.sum(ptd_new, axis=1, keepdims=True) + eps)
    return PLSAState(p_w_t=pwt_new, p_t_d=ptd_new), ll


def fit(counts, cfg: PLSAConfig, epochs: int = 200, tol: float = 1e-4, log=None):
    counts = jnp.asarray(counts, jnp.float32)
    state = init(jax.random.PRNGKey(cfg.seed), cfg, counts.shape[0])
    step = jax.jit(lambda s: em_step(s, counts, cfg.eps))
    prev = -jnp.inf
    ll = prev
    for i in range(epochs):
        state, ll = step(state)
        if log:
            log(f"plsa epoch {i}: loglik={float(ll):.2f}")
        if jnp.abs(ll - prev) < tol:
            break
        prev = ll
    return state, float(ll)


def fit_scan(counts, cfg: PLSAConfig, epochs: int = 200,
             tol_total: float = 1e-3):
    """Whole EM loop as ONE compiled program (lax.while_loop, reference
    convergence semantics — em_algo_abst.h:33-48: stop when the TOTAL
    log-likelihood moves <= tol between epochs, cap `epochs`) with a
    single readback — the gmm.fit_scan shape. Returns
    (state, final total log-likelihood, epochs run)."""
    counts = jnp.asarray(counts, jnp.float32)
    state0 = init(jax.random.PRNGKey(cfg.seed), cfg, counts.shape[0])

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
            s2, ll2 = em_step(s, counts, cfg.eps)
            return s2, i + 1, ll2, ll

        s, i, ll, _ = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), -jnp.inf, -jnp.inf)
        )
        return s, ll, i

    state, ll, i = run(state0)
    return state, float(ll), int(i)


def top_words(state: PLSAState, k: int = 10):
    """Top-k word ids per topic (the reference's topic dump,
    train_tm_algo.cpp:175-213)."""
    return jax.lax.top_k(state.p_w_t, k)[1]


def doc_topics(state: PLSAState):
    return jnp.argmax(state.p_t_d, axis=-1)
