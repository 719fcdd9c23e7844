"""word2vec-style CBOW embeddings — negative sampling AND hierarchical
softmax, like the reference's Train_Embed_Algo (train_embed_algo.{h,cpp}:
Huffman tree :15-72, unigram^0.75 negative table :175-200, frequent-word
subsampling :111-118, Hogwild updates :195-200; config: window 6, dim 100,
vocab 5000).

TPU-first: examples become dense [B, 2W] context batches; the Huffman path
per word is padded to max code length with a sign/mask pair so the
hsoftmax loss is one masked gather+dot; the Hogwild races disappear — each
jitted step applies exact summed gradients.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .. import optim


@dataclasses.dataclass(frozen=True)
class CBOWConfig:
    vocab_size: int = 5000
    dim: int = 100
    window: int = 6
    n_negatives: int = 5
    mode: str = "negative"  # 'negative' | 'hsoftmax'
    subsample_t: float = 1e-3
    seed: int = 0


# ---------------------------------------------------------------------------
# Host-side corpus preparation


def load_vocab(path: str):
    """Parse the reference vocab format: `id word count` per line."""
    words, counts = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                words.append(parts[1])
                counts.append(int(parts[2]))
    return words, np.asarray(counts, np.int64)


def subsample_corpus(tokens: np.ndarray, counts: np.ndarray, t: float, rng) -> np.ndarray:
    """Frequent-word subsampling: keep prob = sqrt(t/f) + t/f (word2vec;
    reference train_embed_algo.cpp:111-118)."""
    freqs = counts / counts.sum()
    f = freqs[tokens]
    keep_p = np.minimum(1.0, np.sqrt(t / np.maximum(f, 1e-12)) + t / np.maximum(f, 1e-12))
    return tokens[rng.random(len(tokens)) < keep_p]


def make_cbow_examples(tokens: np.ndarray, window: int):
    """Center ids [N], context ids [N, 2*window], context mask [N, 2*window]."""
    n = len(tokens)
    centers = tokens.astype(np.int32)
    ctx = np.zeros((n, 2 * window), np.int32)
    mask = np.zeros((n, 2 * window), np.float32)
    for off in range(1, window + 1):
        # left neighbours
        ctx[off:, window - off] = tokens[:-off]
        mask[off:, window - off] = 1.0
        # right neighbours
        ctx[:-off, window + off - 1] = tokens[off:]
        mask[:-off, window + off - 1] = 1.0
    return centers, ctx, mask


def build_unigram_table(counts: np.ndarray, power: float = 0.75) -> np.ndarray:
    """Normalised unigram^power distribution for negative sampling."""
    p = counts.astype(np.float64) ** power
    return (p / p.sum()).astype(np.float32)


def build_huffman(counts: np.ndarray):
    """Huffman tree over word counts -> per-word (node_ids, signs, mask),
    each [V, max_code_len]. signs: +1 for left (code 0), -1 for right.
    Internal nodes are numbered 0..V-2 (reference builds the same tree at
    train_embed_algo.cpp:15-72)."""
    V = len(counts)
    heap = [(int(c), i) for i, c in enumerate(counts)]
    heapq.heapify(heap)
    parent = {}
    side = {}
    next_internal = 0
    while len(heap) > 1:
        c1, n1 = heapq.heappop(heap)
        c2, n2 = heapq.heappop(heap)
        node_id = V + next_internal
        next_internal += 1
        parent[n1] = node_id
        parent[n2] = node_id
        side[n1] = +1.0
        side[n2] = -1.0
        heapq.heappush(heap, (c1 + c2, node_id))
    root = heap[0][1]

    paths, signs = [], []
    max_len = 0
    for w in range(V):
        p, s = [], []
        node = w
        while node != root:
            par = parent[node]
            p.append(par - V)  # internal-node index 0..V-2
            s.append(side[node])
            node = par
        p.reverse()
        s.reverse()
        paths.append(p)
        signs.append(s)
        max_len = max(max_len, len(p))

    node_ids = np.zeros((V, max_len), np.int32)
    sign_arr = np.zeros((V, max_len), np.float32)
    mask = np.zeros((V, max_len), np.float32)
    for w in range(V):
        L = len(paths[w])
        node_ids[w, :L] = paths[w]
        sign_arr[w, :L] = signs[w]
        mask[w, :L] = 1.0
    return node_ids, sign_arr, mask


# ---------------------------------------------------------------------------
# Model


def init(rng: jax.Array, cfg: CBOWConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    params = {
        "emb": (jax.random.uniform(k1, (cfg.vocab_size, cfg.dim)) - 0.5) / cfg.dim,
    }
    if cfg.mode == "negative":
        params["out"] = jnp.zeros((cfg.vocab_size, cfg.dim))
    else:  # hsoftmax: one vector per internal node
        params["nodes"] = jnp.zeros((cfg.vocab_size, cfg.dim))
    return params


def _context_mean(params, ctx, mask):
    e = params["emb"][ctx] * mask[..., None]
    return jnp.sum(e, axis=1) / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)


def negative_sampling_loss(params, batch, cfg: CBOWConfig, rng) -> jax.Array:
    """batch: centers [B], ctx [B,2W], mask [B,2W], neg [B,K] pre-sampled."""
    h = _context_mean(params, batch["ctx"], batch["mask"])        # [B,D]
    pos_u = params["out"][batch["centers"]]                        # [B,D]
    neg_u = params["out"][batch["neg"]]                            # [B,K,D]
    pos_score = jnp.sum(pos_u * h, axis=-1)
    neg_score = jnp.einsum("bkd,bd->bk", neg_u, h)
    loss = -jax.nn.log_sigmoid(pos_score) - jnp.sum(
        jax.nn.log_sigmoid(-neg_score), axis=-1
    )
    return jnp.mean(loss)


def hsoftmax_loss(params, batch, cfg: CBOWConfig, tree) -> jax.Array:
    """tree = (node_ids [V,L], signs [V,L], mask [V,L])."""
    node_ids, signs, tmask = tree
    h = _context_mean(params, batch["ctx"], batch["mask"])        # [B,D]
    nodes = params["nodes"][node_ids[batch["centers"]]]           # [B,L,D]
    s = signs[batch["centers"]]                                   # [B,L]
    m = tmask[batch["centers"]]
    score = jnp.einsum("bld,bd->bl", nodes, h) * s
    per = -jnp.sum(jax.nn.log_sigmoid(score) * m, axis=-1)
    return jnp.mean(per)


def train_cbow(
    tokens: np.ndarray,
    counts: np.ndarray,
    cfg: CBOWConfig,
    epochs: int = 5,
    batch_size: int = 1024,
    learning_rate: float = 0.05,
    log=None,
    fused: bool = True,
) -> dict:
    """Full CBOW training from a token-id stream. Returns params.

    fused=True (default) runs ALL epochs as one compiled program with
    device-side shuffling and in-graph negative sampling; fused=False
    keeps the per-batch host loop (host-numpy negatives — a different
    RNG stream, so trajectories differ between the modes)."""
    rng_np = np.random.default_rng(cfg.seed)
    tokens = subsample_corpus(tokens, counts, cfg.subsample_t, rng_np)
    centers, ctx, mask = make_cbow_examples(tokens, cfg.window)
    if len(centers) == 0:
        raise ValueError("empty corpus after subsampling")
    batch_size = min(batch_size, len(centers))

    params = init(jax.random.PRNGKey(cfg.seed), cfg)
    tx = optim.adagrad(learning_rate)
    opt_state = tx.init(params)

    tree = None
    unigram = None
    if cfg.mode == "hsoftmax":
        tree_np = build_huffman(counts)
        tree = tuple(jnp.asarray(t) for t in tree_np)

        def loss_fn(p, b):
            return hsoftmax_loss(p, b, cfg, tree)
    else:
        unigram = build_unigram_table(counts)

        def loss_fn(p, b):
            return negative_sampling_loss(p, b, cfg, None)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optim.apply_updates(params, updates), opt_state, loss

    n = len(centers)
    n_batches = n // batch_size
    if fused and n_batches >= 1:
        # the WHOLE training as ONE compiled program (the NFM
        # make_streaming_run shape): examples on device once, per-epoch
        # device-side permutation, negatives drawn in-graph from the
        # unigram^0.75 table, nested lax.scan, one readback. Per-batch
        # host dispatch measured the TEST_EMB composite SLOWER on the
        # TPU than on CPU (108 s vs 89.4 s reference;
        # benchmarks/bench_topic_embed_headtohead.py provenance).
        dev = {
            "centers": jnp.asarray(centers),
            "ctx": jnp.asarray(ctx),
            "mask": jnp.asarray(mask),
        }
        neg_logits = (jnp.log(jnp.asarray(unigram) + 1e-30)
                      if cfg.mode == "negative" else None)

        @jax.jit
        def run(params, opt_state, rng):
            def epoch_body(carry, erng):
                p, o = carry
                kperm, kneg = jax.random.split(erng)
                perm = jax.random.permutation(kperm, n)

                def batch_body(carry, i):
                    p, o = carry
                    idx = jax.lax.dynamic_slice_in_dim(
                        perm, i * batch_size, batch_size)
                    b = {k: v[idx] for k, v in dev.items()}
                    if neg_logits is not None:
                        b["neg"] = jax.random.categorical(
                            jax.random.fold_in(kneg, i), neg_logits,
                            shape=(batch_size, cfg.n_negatives),
                        ).astype(jnp.int32)
                    loss, grads = jax.value_and_grad(loss_fn)(p, b)
                    updates, o = tx.update(grads, o, p)
                    return (optim.apply_updates(p, updates), o), loss

                (p, o), losses = jax.lax.scan(
                    batch_body, (p, o), jnp.arange(n_batches))
                return (p, o), jnp.mean(losses)

            (params, opt_state), epoch_losses = jax.lax.scan(
                epoch_body, (params, opt_state),
                jax.random.split(rng, epochs))
            return params, epoch_losses

        params, epoch_losses = run(
            params, opt_state,
            jax.random.PRNGKey(rng_np.integers(2**31)))
        if log:
            for epoch, l in enumerate(np.asarray(epoch_losses)):
                log(f"cbow epoch {epoch}: loss={float(l):.4f}")
        return params

    for epoch in range(epochs):
        order = rng_np.permutation(n)
        losses = []
        for s0 in range(0, n - batch_size + 1, batch_size):
            idx = order[s0 : s0 + batch_size]
            batch = {
                "centers": jnp.asarray(centers[idx]),
                "ctx": jnp.asarray(ctx[idx]),
                "mask": jnp.asarray(mask[idx]),
            }
            if cfg.mode == "negative":
                neg = rng_np.choice(
                    cfg.vocab_size, size=(len(idx), cfg.n_negatives), p=unigram
                ).astype(np.int32)
                batch["neg"] = jnp.asarray(neg)
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        if log:
            log(f"cbow epoch {epoch}: loss={np.mean(losses):.4f}")
    return params


def train_cbow_streaming(
    chunks_factory,
    counts: np.ndarray,
    cfg: CBOWConfig,
    epochs: int = 5,
    batch_size: int = 1024,
    learning_rate: float = 0.05,
    log=None,
) -> dict:
    """CBOW training over a STREAMED corpus: chunks_factory(epoch) yields
    token-id chunks (e.g. data/prep.token_chunks_from_text), so corpora
    larger than memory train with the same math as train_cbow. Example
    building, subsampling, and negative sampling run on the Prefetcher
    thread; the device sees one fixed [batch_size] shape (one compile).
    Leftover examples carry across chunks; the sub-batch tail of an epoch
    is dropped (same policy as train_cbow's stride loop)."""
    from ..data.pipeline import Prefetcher

    rng_np = np.random.default_rng(cfg.seed)
    params = init(jax.random.PRNGKey(cfg.seed), cfg)
    tx = optim.adagrad(learning_rate)
    opt_state = tx.init(params)

    if cfg.mode == "hsoftmax":
        tree = tuple(jnp.asarray(t) for t in build_huffman(counts))
        unigram = None

        def loss_fn(p, b):
            return hsoftmax_loss(p, b, cfg, tree)
    else:
        unigram = build_unigram_table(counts)

        def loss_fn(p, b):
            return negative_sampling_loss(p, b, cfg, None)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optim.apply_updates(params, updates), opt_state, loss

    def batches(epoch):
        carry = None  # (centers, ctx, mask) leftovers across chunks
        for tokens in chunks_factory(epoch):
            tokens = subsample_corpus(tokens, counts, cfg.subsample_t, rng_np)
            if len(tokens) < 2:
                continue
            c, x, m = make_cbow_examples(tokens, cfg.window)
            if carry is not None:
                c = np.concatenate([carry[0], c])
                x = np.concatenate([carry[1], x])
                m = np.concatenate([carry[2], m])
            order = rng_np.permutation(len(c))
            n_full = (len(c) // batch_size) * batch_size
            for s0 in range(0, n_full, batch_size):
                idx = order[s0:s0 + batch_size]
                b = {"centers": c[idx], "ctx": x[idx], "mask": m[idx]}
                if unigram is not None:
                    b["neg"] = rng_np.choice(
                        cfg.vocab_size, size=(batch_size, cfg.n_negatives),
                        p=unigram).astype(np.int32)
                yield b
            tail = order[n_full:]
            carry = (c[tail], x[tail], m[tail]) if len(tail) else None

    pf = Prefetcher(batches)
    for epoch in range(epochs):
        losses = []
        for batch in pf.epoch(epoch):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        if log and losses:
            log(f"cbow epoch {epoch}: loss={np.mean(losses):.4f}")
    return params


def normalized_embeddings(params) -> jax.Array:
    """L2-normalised embedding matrix (reference saves normalised vectors,
    train_embed_algo.cpp:88-94)."""
    e = params["emb"]
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)


def save_embeddings(path: str, params, words=None):
    emb = np.asarray(normalized_embeddings(params))
    with open(path, "w") as f:
        for i, row in enumerate(emb):
            tag = words[i] if words else str(i)
            f.write(tag + " " + " ".join(f"{v:.6f}" for v in row) + "\n")


def load_embeddings(path: str):
    words, rows = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            words.append(parts[0])
            rows.append(np.asarray(parts[1:], np.float32))
    return words, np.stack(rows)
